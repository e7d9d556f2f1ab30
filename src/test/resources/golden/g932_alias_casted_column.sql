-- alias_casted_column.q (HIVE-2477): a bare CAST in a subquery keeps
-- the ORIGINAL column's name, so the outer query can reference it;
-- an explicit alias wins when present.
SELECT n_nationkey FROM (SELECT cast(n_nationkey AS int) FROM nation) t
WHERE n_nationkey < 3
UNION ALL
SELECT key2 FROM (SELECT cast(n_nationkey AS int) key2 FROM nation) t
WHERE key2 = 20
ORDER BY n_nationkey
