-- reference: ql/src/test/queries/clientnegative/archive_partspec3.q
-- ARCHIVE PARTITION () — an empty spec refuses
-- ERROR-CONTAINS: orders have to be exactly the same | partition spec | syntax
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_arch_empty;
CREATE TABLE neg_arch_empty (key STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_arch_empty PARTITION (ds='d') VALUES ('k');
ALTER TABLE neg_arch_empty ARCHIVE PARTITION ();
