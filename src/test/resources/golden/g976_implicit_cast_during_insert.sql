-- implicit_cast_during_insert.q: dynamic-partition INSERT where the
-- partition expression duplicates a data column under an alias and the
-- string key implicitly casts to the int data column — the cast must
-- not disturb the partition value (HIVE-10307 family).
DROP TABLE IF EXISTS g976_t;
CREATE TABLE g976_t (c1 INT, c2 STRING)
  USING parquet PARTITIONED BY (p1 STRING);
SET hive.exec.dynamic.partition.mode=nonstrict;
INSERT OVERWRITE TABLE g976_t PARTITION (p1)
  SELECT key, value, key AS key1 FROM
    (SELECT CAST(n_nationkey AS STRING) AS key, n_name AS value
     FROM nation WHERE n_nationkey IN (0, 1)) q
  DISTRIBUTE BY key1 SORT BY key1;
SELECT c1, c2, p1 FROM g976_t ORDER BY c1
