-- auto_join_nulls.q, auto_join23.q, auto_join24.q, auto_join26.q,
-- auto_join27.q, auto_join28.q, auto_join29.q, auto_join31.q,
-- auto_join32.q: NULL join keys
-- never match (inner and outer), and the value-reordering join
-- (auto_join_reordering_values.q) keeps column bindings straight.
DROP TABLE IF EXISTS g634_n;
CREATE TABLE g634_n USING parquet AS
  SELECT CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_nationkey END AS k, n_name AS v
  FROM nation;
SELECT 'inner_null_keys' AS tag, COUNT(*) AS n FROM g634_n a JOIN g634_n b ON a.k = b.k
UNION ALL
SELECT 'louter_null_keys', COUNT(*) FROM g634_n a LEFT OUTER JOIN g634_n b ON a.k = b.k
UNION ALL
SELECT 'null_rows_kept', COUNT(*) FROM g634_n a LEFT OUTER JOIN g634_n b ON a.k = b.k WHERE a.k IS NULL
UNION ALL
SELECT 'reordered_values', SUM(CASE WHEN b.v = a.v THEN 1 ELSE 0 END)
FROM g634_n a JOIN g634_n b ON a.k = b.k
