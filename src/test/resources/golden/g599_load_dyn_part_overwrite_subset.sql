-- load_dyn_part9.q/10.q: dynamic INSERT OVERWRITE replaces ONLY the
-- partitions the query writes (hive.exec.dynamic.partition.mode=
-- nonstrict MoveTask semantics); untouched partitions keep their rows.
DROP TABLE IF EXISTS g599_t;
CREATE TABLE g599_t (k INT) USING parquet PARTITIONED BY (p STRING);
INSERT OVERWRITE TABLE g599_t PARTITION (p)
  SELECT n_nationkey, CAST(n_regionkey AS STRING) FROM nation;
INSERT OVERWRITE TABLE g599_t PARTITION (p)
  SELECT n_nationkey + 100, CAST(n_regionkey AS STRING) FROM nation WHERE n_regionkey = 2;
SELECT p, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k FROM g599_t GROUP BY p
