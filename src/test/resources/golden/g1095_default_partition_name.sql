-- reference: ql/src/test/queries/clientpositive/
-- default_partition_name.q (+ dynamic_partition_skip_default shape) —
-- the __HIVE_DEFAULT_PARTITION__ literal as an addable partition value
-- and as the landing slot for NULL dynamic-partition values.
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1095_t;
CREATE TABLE g1095_t (key INT)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
ALTER TABLE g1095_t ADD PARTITION (ds='__HIVE_DEFAULT_PARTITION__');
INSERT INTO g1095_t PARTITION (ds)
  SELECT CAST(n_nationkey AS INT),
         CASE WHEN n_nationkey % 2 = 0 THEN 'd1' ELSE NULL END
  FROM nation WHERE n_nationkey < 6;
SELECT ds, count(key) AS n FROM g1095_t GROUP BY ds
