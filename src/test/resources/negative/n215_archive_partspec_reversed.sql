-- reference: ql/src/test/queries/clientnegative/archive_partspec4.q
-- ARCHIVE spec keys in reversed textual order refuse (ErrorMsg 10125:
-- names AND orders must match the table schema exactly)
-- ERROR-CONTAINS: orders have to be exactly the same
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_rev;
CREATE TABLE neg_arch_rev (key STRING, value STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO neg_arch_rev PARTITION (ds='2008-04-08', hr='12') VALUES ('k', 'v');
ALTER TABLE neg_arch_rev ARCHIVE PARTITION (hr='12', ds='2008-04-08');
