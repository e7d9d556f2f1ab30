-- reference: ql/src/test/queries/clientnegative/groupby_key.q
-- a selected column missing from GROUP BY is refused, not silently
-- aggregated
-- ERROR-CONTAINS: MISSING_AGGREGATION | not in GROUP BY | MISSING_GROUP_BY
SELECT n_name, count(1) FROM nation GROUP BY n_regionkey;
