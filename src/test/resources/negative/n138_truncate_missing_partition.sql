-- reference: ql/src/test/queries/clientnegative/truncate_table_failure2.q
-- TRUNCATE of a partition that does not exist
-- ERROR-CONTAINS: PARTITIONS_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_tr2;
CREATE TABLE neg_tr2 (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_tr2 VALUES ('a', '1');
TRUNCATE TABLE neg_tr2 PARTITION (dt='2012-12-17');
