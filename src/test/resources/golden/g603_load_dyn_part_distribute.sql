-- load_dyn_part4.q + the classic fan-out discipline: DISTRIBUTE BY the
-- dynamic partition column before the insert (one writer per partition,
-- the shape Hive demands at scale); results identical to the plain form.
DROP TABLE IF EXISTS g603_t;
CREATE TABLE g603_t (k INT) USING parquet PARTITIONED BY (p STRING);
INSERT OVERWRITE TABLE g603_t PARTITION (p)
  SELECT n_nationkey, CAST(n_regionkey AS STRING) FROM nation DISTRIBUTE BY n_regionkey;
SELECT p, COUNT(*) AS n, SUM(k) AS sum_k FROM g603_t GROUP BY p
