-- input12.q / input13.q / input14.q: one FROM source, three destinations
-- with disjoint filters (the classic multi-insert), third destination
-- partitioned.
DROP TABLE IF EXISTS g648_d1;
DROP TABLE IF EXISTS g648_d2;
DROP TABLE IF EXISTS g648_d3;
CREATE TABLE g648_d1 (k INT, v STRING) USING parquet;
CREATE TABLE g648_d2 (k INT, v STRING) USING parquet;
CREATE TABLE g648_d3 (k INT) USING parquet PARTITIONED BY (p STRING);
FROM nation
INSERT OVERWRITE TABLE g648_d1 SELECT n_nationkey, n_name WHERE n_nationkey < 8
INSERT OVERWRITE TABLE g648_d2 SELECT n_nationkey, n_name WHERE n_nationkey >= 8 AND n_nationkey < 16
INSERT OVERWRITE TABLE g648_d3 PARTITION (p='hi') SELECT n_nationkey WHERE n_nationkey >= 16;
SELECT 'd1' AS tag, COUNT(*) AS n, SUM(k) AS s FROM g648_d1
UNION ALL SELECT 'd2', COUNT(*), SUM(k) FROM g648_d2
UNION ALL SELECT 'd3', COUNT(*), SUM(k) FROM g648_d3
