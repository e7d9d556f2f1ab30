-- reference: ql/src/test/queries/clientnegative/archive_partspec1.q
-- ARCHIVE spec naming a column that is not a partition column refuses
-- ERROR-CONTAINS: orders have to be exactly the same | not the same as that defined
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_unk;
CREATE TABLE neg_arch_unk (key STRING, ds STRING, hr STRING) USING parquet PARTITIONED BY (ds, hr);
INSERT INTO neg_arch_unk PARTITION (ds='d', hr='12') VALUES ('k');
ALTER TABLE neg_arch_unk ARCHIVE PARTITION (ds='d', nonexistingpart='12');
