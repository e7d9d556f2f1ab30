-- reference: ql/src/test/queries/clientnegative/dynamic_partitions_with_whitelist.q
-- A DYNAMIC partition value derived from the data that violates the
-- whitelist refuses before anything is written (the reference's
-- VerifyTableDirectoryIsEmptyHook asserts the same no-residue contract;
-- here the one-pass staging guarantees it).
-- ERROR-CONTAINS: contains a character not matched by whitelist pattern
SET hive.metastore.partition.name.whitelist.pattern=[^9]*;
SET hive.exec.dynamic.partition=true;
SET hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS neg_wl_dyn_src;
DROP TABLE IF EXISTS neg_wl_dyn;
CREATE TABLE neg_wl_dyn_src (key STRING, hr STRING, ds STRING) USING parquet;
INSERT INTO neg_wl_dyn_src VALUES ('k1', '11', '2008-04-08'),
  ('k2', '11', '2008-04-09');
CREATE TABLE neg_wl_dyn (key STRING) USING parquet
  PARTITIONED BY (ds STRING, hr STRING);
INSERT OVERWRITE TABLE neg_wl_dyn PARTITION (ds, hr)
SELECT key, ds, hr FROM neg_wl_dyn_src;
