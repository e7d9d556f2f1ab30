-- reference: ql/src/test/queries/clientnegative/alter_rename_partition_failure.q
-- RENAME of a partition that does not exist
-- ERROR-CONTAINS: PARTITIONS_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_rp1;
CREATE TABLE neg_rp1 (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_rp1 VALUES ('a', 'old_part1');
ALTER TABLE neg_rp1 PARTITION (dt='nonexist_part1') RENAME TO PARTITION (dt='new_part1');
