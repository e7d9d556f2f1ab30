-- reference: ql/src/test/queries/clientnegative/having1.q
-- HAVING over a plain SELECT * — no GROUP BY, nothing aggregated
-- ERROR-CONTAINS: MISSING_GROUP_BY | does not include a GROUP BY
SELECT * FROM nation HAVING n_regionkey > 2;
