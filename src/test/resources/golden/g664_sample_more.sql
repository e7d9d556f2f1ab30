-- sample1.q, sample3.q, sample9.q, sample10.q: sampling over a
-- partitioned input, sampled subquery feeding a join, and sampling a
-- bucketed TABLE where the sample can read just its bucket file.
DROP TABLE IF EXISTS g664_b;
CREATE TABLE g664_b (k INT, v STRING) USING parquet CLUSTERED BY (k) INTO 4 BUCKETS;
INSERT INTO g664_b SELECT n_nationkey, n_name FROM nation;
SELECT 'bucketed_sample' AS tag, COUNT(*) AS n FROM g664_b TABLESAMPLE (BUCKET 2 OUT OF 4 ON k)
UNION ALL
SELECT 'subq_sample_join', COUNT(*) FROM
  (SELECT * FROM nation TABLESAMPLE (BUCKET 1 OUT OF 2 ON n_nationkey)) a
  JOIN region r ON a.n_regionkey = r.r_regionkey
UNION ALL
SELECT 'sampled_union', COUNT(*) FROM (
  SELECT n_nationkey FROM nation TABLESAMPLE (BUCKET 1 OUT OF 4 ON n_nationkey)
  UNION ALL
  SELECT n_nationkey FROM nation TABLESAMPLE (BUCKET 2 OUT OF 4 ON n_nationkey)) u
