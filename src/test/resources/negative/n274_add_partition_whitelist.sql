-- reference: ql/src/test/queries/clientnegative/add_partition_with_whitelist.q
-- With a partition-name whitelist pattern set, ADD PARTITION with a
-- value outside the pattern is refused with the metastore's message.
-- ERROR-CONTAINS: contains a character not matched by whitelist pattern
SET hive.metastore.partition.name.whitelist.pattern=[A-Za-z]*;
DROP TABLE IF EXISTS neg_wl_add;
CREATE TABLE neg_wl_add (key STRING) USING parquet PARTITIONED BY (ds STRING);
ALTER TABLE neg_wl_add ADD PARTITION (ds='1,2,3,4');
