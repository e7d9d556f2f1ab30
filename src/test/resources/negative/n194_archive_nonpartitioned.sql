-- reference: ql/src/test/queries/clientnegative/archive1.q — ARCHIVE
-- against a non-partitioned table cannot name a partition to pack.
-- ERROR-CONTAINS: not the same as | only be run on partitions
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_np;
CREATE TABLE neg_arch_np (v STRING) USING parquet;
ALTER TABLE neg_arch_np ARCHIVE PARTITION (ds='d1');
