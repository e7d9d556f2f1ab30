-- reference: ql/src/test/queries/clientpositive/parquet_partitioned.q —
-- dynamic-partition INSERT OVERWRITE from a staging table into a
-- parquet-partitioned table, then per-partition counts.
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1066_staging;
DROP TABLE IF EXISTS g1066_part;
CREATE TABLE g1066_staging (id INT, str STRING, part STRING) USING parquet;
INSERT INTO g1066_staging
  SELECT CAST(n_nationkey AS INT), n_name, concat('p', n_regionkey) FROM nation;
CREATE TABLE g1066_part (id INT, str STRING)
  PARTITIONED BY (part STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1066_part PARTITION (part)
  SELECT id, str, part FROM g1066_staging;
SELECT part, COUNT(0) AS cnt, MIN(id) AS mn, MAX(id) AS mx
FROM g1066_part GROUP BY part
