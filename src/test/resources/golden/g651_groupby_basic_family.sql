-- groupby1.q, groupby2.q, groupby7.q, groupby8.q, groupby9.q,
-- groupby10.q, groupby11.q: the basic grouped-insert battery — one
-- grouped source into two destinations, group by substring prefix, and
-- double aggregation (count + sum of distinct).
DROP TABLE IF EXISTS g651_d1;
DROP TABLE IF EXISTS g651_d2;
CREATE TABLE g651_d1 (k INT, s DOUBLE) USING parquet;
CREATE TABLE g651_d2 (pre STRING, n BIGINT, sd BIGINT) USING parquet;
INSERT OVERWRITE TABLE g651_d1
  SELECT n_regionkey, SUM(n_nationkey) FROM nation GROUP BY n_regionkey;
INSERT OVERWRITE TABLE g651_d2
  SELECT SUBSTR(n_name, 1, 1), COUNT(*), SUM(DISTINCT n_regionkey)
  FROM nation GROUP BY SUBSTR(n_name, 1, 1);
SELECT 'd1' AS tag, COUNT(*) AS rows_, CAST(SUM(s) AS BIGINT) AS tot FROM g651_d1
UNION ALL
SELECT 'd2', COUNT(*), SUM(n) FROM g651_d2
