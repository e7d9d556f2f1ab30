-- reference: metastore partition-name whitelist
-- (hive.metastore.partition.name.whitelist.pattern,
-- add_partition_with_whitelist.q family): the pattern must match the
-- WHOLE value — a value whose prefix matches but carries a trailing
-- illegal character is refused, pinning matches() (not find()) parity.
-- ERROR-CONTAINS: not matched by whitelist pattern
DROP TABLE IF EXISTS neg_wl_part;
CREATE TABLE neg_wl_part (i INT) USING parquet PARTITIONED BY (p STRING);
set hive.metastore.partition.name.whitelist.pattern=[a-z]+;
ALTER TABLE neg_wl_part ADD PARTITION (p='abc1');
