-- multi_insert_union_src.q: FROM-first multi-insert whose shared source
-- is a UNION ALL of two differently-filtered scans; each branch filters
-- the union again.
DROP TABLE IF EXISTS g856_m1;
DROP TABLE IF EXISTS g856_m2;
CREATE TABLE g856_m1 (key BIGINT, value STRING) USING parquet;
CREATE TABLE g856_m2 (key BIGINT, value STRING) USING parquet;
FROM (SELECT o_orderkey AS key, o_orderstatus AS value FROM orders WHERE o_orderkey < 10
      UNION ALL
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey > 100) s
INSERT OVERWRITE TABLE g856_m1 SELECT key, value WHERE key < 150
INSERT OVERWRITE TABLE g856_m2 SELECT key, value WHERE key > 400 AND key < 500;
SELECT 'm1' AS tag, key, value FROM g856_m1
UNION ALL
SELECT 'm2', key, value FROM g856_m2
