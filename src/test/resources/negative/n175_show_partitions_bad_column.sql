-- reference: ql/src/test/queries/clientnegative/show_partitions1.q
-- (spec-validation leg): SHOW PARTITIONS with a non-partition column
-- ERROR-CONTAINS: PARTITIONS_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_spb;
CREATE TABLE neg_spb (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
SHOW PARTITIONS neg_spb PARTITION (zz='1');
