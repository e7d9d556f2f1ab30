-- reference: ql/src/test/queries/clientnegative/drop_partition_filter_failure.q
-- drop-by-filter naming a NON-partition column
-- ERROR-CONTAINS: not a partition column
DROP TABLE IF EXISTS neg_dpf;
CREATE TABLE neg_dpf (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_dpf VALUES ('a', '1');
ALTER TABLE neg_dpf DROP PARTITION (k < 'z');
