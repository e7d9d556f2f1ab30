-- union13.q: self-union of the same table — every row appears exactly
-- twice, aggregated to keep the golden compact.
SELECT key, count(1) AS n FROM (
  SELECT s1.n_nationkey AS key, s1.n_name AS value FROM nation s1
  UNION ALL
  SELECT s2.n_nationkey AS key, s2.n_name AS value FROM nation s2
) unionsrc GROUP BY key
