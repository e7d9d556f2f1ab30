-- reference: ql/src/test/queries/clientnegative/archive_partspec5.q
-- ARCHIVE spec skipping a middle partition column (ds, min) on a
-- (ds, hr, min) table refuses (ErrorMsg 10125)
-- ERROR-CONTAINS: orders have to be exactly the same
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_skip;
CREATE TABLE neg_arch_skip (key STRING, ds STRING, hr STRING, min STRING) USING parquet PARTITIONED BY (ds, hr, min);
INSERT INTO neg_arch_skip PARTITION (ds='d', hr='12', min='00') VALUES ('k');
ALTER TABLE neg_arch_skip ARCHIVE PARTITION (ds='d', min='00');
