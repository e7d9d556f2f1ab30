-- groupby3_map.q / groupby4.q / groupby5.q / groupby6.q / groupby7_map.q:
-- map-side aggregation variants — grouping by SUBSTR of a key, multiple
-- aggregates per group, and two inserts from one grouped source.
DROP TABLE IF EXISTS g647_d1;
DROP TABLE IF EXISTS g647_d2;
CREATE TABLE g647_d1 (c STRING, n BIGINT) USING parquet;
CREATE TABLE g647_d2 (c STRING, s BIGINT) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g647_d1 SELECT SUBSTR(n_name, 1, 1), COUNT(*) GROUP BY SUBSTR(n_name, 1, 1)
INSERT OVERWRITE TABLE g647_d2 SELECT SUBSTR(n_name, 1, 1), SUM(n_nationkey) GROUP BY SUBSTR(n_name, 1, 1);
SELECT 'd1' AS tag, COUNT(*) AS rows_, SUM(n) AS total FROM g647_d1
UNION ALL
SELECT 'd2', COUNT(*), SUM(s) FROM g647_d2
UNION ALL
SELECT 'direct', COUNT(*), SUM(cnt) FROM
  (SELECT SUBSTR(n_name, 1, 2) AS pre, COUNT(*) AS cnt, AVG(n_nationkey) AS a,
          MAX(n_regionkey) AS mx, MIN(n_regionkey) AS mn
   FROM nation GROUP BY SUBSTR(n_name, 1, 2)) g
