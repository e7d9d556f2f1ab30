-- reference: ql/src/test/queries/clientnegative/strict_orderby.q
-- strict mode refuses a global ORDER BY with no LIMIT (one-reducer sort)
-- ERROR-CONTAINS: ORDER BY is specified, LIMIT must also be specified
SET hive.mapred.mode=strict;
SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey;
