-- reference: ql/src/test/queries/clientnegative/alter_partition_with_whitelist.q
-- A partition RENAME whose TARGET value violates the whitelist refuses
-- (the source partition was added while it passed the pattern).
-- ERROR-CONTAINS: Unable to rename partition. Partition value
SET hive.metastore.partition.name.whitelist.pattern=[A-Za-z]*;
DROP TABLE IF EXISTS neg_wl_ren;
CREATE TABLE neg_wl_ren (key STRING) USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE neg_wl_ren ADD PARTITION (ds='One');
ALTER TABLE neg_wl_ren PARTITION (ds='One') RENAME TO PARTITION (ds='x,y');
