-- sample2.q / sample4.q / sample5.q / sample6.q / sample7.q: bucket
-- sampling battery — TABLESAMPLE(BUCKET x OUT OF y ON col) on plain
-- tables, nested in joins, and with a WHERE on top (deterministic:
-- ON-column hash, never input-split position).
SELECT 'b1of2' AS tag, COUNT(*) AS n FROM
  nation TABLESAMPLE (BUCKET 1 OUT OF 2 ON n_nationkey)
UNION ALL
SELECT 'b2of4', COUNT(*) FROM
  nation TABLESAMPLE (BUCKET 2 OUT OF 4 ON n_nationkey)
UNION ALL
SELECT 'sample_join', COUNT(*) FROM
  nation TABLESAMPLE (BUCKET 1 OUT OF 2 ON n_nationkey) a
  JOIN region b ON a.n_regionkey = b.r_regionkey
UNION ALL
SELECT 'sample_where', COUNT(*) FROM
  nation TABLESAMPLE (BUCKET 1 OUT OF 2 ON n_nationkey)
  WHERE n_regionkey < 2
