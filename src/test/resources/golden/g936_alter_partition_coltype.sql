-- alter_partition_coltype.q: ALTER TABLE ... PARTITION COLUMN (col type)
-- retypes a partition KEY in place (metadata-only); existing partitions
-- keep reading, predicates compare under the new type (dt=100 as int,
-- ts='6.30' as double = 6.3), and new partitions land under it.
DROP TABLE IF EXISTS g936_ct;
CREATE TABLE g936_ct (key STRING) USING parquet
  PARTITIONED BY (dt STRING, ts STRING);
INSERT OVERWRITE TABLE g936_ct PARTITION (dt='100', ts='6.30')
  SELECT n_name FROM nation WHERE n_nationkey < 3;
ALTER TABLE g936_ct PARTITION COLUMN (dt INT);
INSERT OVERWRITE TABLE g936_ct PARTITION (dt=100, ts='3.0')
  SELECT n_name FROM nation WHERE n_nationkey < 2;
ALTER TABLE g936_ct PARTITION COLUMN (ts DOUBLE);
SELECT
  (SELECT count(*) FROM g936_ct WHERE dt = 100) AS n_dt,
  (SELECT count(*) FROM g936_ct WHERE ts = 6.3) AS n_ts63,
  (SELECT count(*) FROM g936_ct WHERE ts = 3.0 AND dt = 100) AS n_both,
  (SELECT count(*) FROM g936_ct WHERE dt IS NOT NULL) AS n_all
