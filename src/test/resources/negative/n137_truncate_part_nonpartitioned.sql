-- reference: ql/src/test/queries/clientnegative/truncate_table_failure1.q
-- TRUNCATE with a partition spec on a non-partitioned table
-- ERROR-CONTAINS: not supported for tables that are not partitioned | not partitioned
DROP TABLE IF EXISTS neg_tr1;
CREATE TABLE neg_tr1 (k STRING) USING PARQUET;
TRUNCATE TABLE neg_tr1 PARTITION (ds='2008-04-08');
