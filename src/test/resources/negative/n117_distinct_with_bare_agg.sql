-- reference: ql/src/test/queries/clientnegative/udaf_invalid_place.q
-- SELECT DISTINCT mixing a bare column with an aggregate, no GROUP BY
-- ERROR-CONTAINS: MISSING_GROUP_BY | does not include a GROUP BY
SELECT DISTINCT n_regionkey, sum(n_nationkey) FROM nation;
