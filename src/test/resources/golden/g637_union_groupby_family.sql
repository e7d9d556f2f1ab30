-- union13.q..union19.q: self-union then GROUP BY, union inside an
-- INSERT source, and group-by over a union of differently-filtered
-- branches.
DROP TABLE IF EXISTS g637_d;
CREATE TABLE g637_d (k INT, cnt BIGINT) USING parquet;
INSERT OVERWRITE TABLE g637_d
SELECT k, COUNT(*) FROM (
  SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 1
  UNION ALL
  SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10) u
GROUP BY k;
SELECT 'insert_union_gby' AS tag, COUNT(*) AS n, SUM(cnt) AS s FROM g637_d
UNION ALL
SELECT 'self_union_gby', COUNT(*), SUM(c) FROM
  (SELECT n_regionkey, COUNT(*) AS c FROM
    (SELECT * FROM nation UNION ALL SELECT * FROM nation) uu
   GROUP BY n_regionkey) g
