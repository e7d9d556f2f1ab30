-- alter5.q (HIVE-2117): ADD PARTITION with a RELATIVE location resolves
-- against the TABLE directory ("partition subdir should be named
-- 'parta'"); writes into the partition land there and read back.
DROP TABLE IF EXISTS g937_a5;
CREATE TABLE g937_a5 (col1 STRING) USING parquet PARTITIONED BY (dt STRING);
ALTER TABLE g937_a5 ADD PARTITION (dt='a') LOCATION 'parta';
INSERT OVERWRITE TABLE g937_a5 PARTITION (dt='a')
  SELECT n_name FROM nation WHERE n_nationkey < 4;
SELECT dt, count(*) AS n FROM g937_a5 GROUP BY dt ORDER BY dt
