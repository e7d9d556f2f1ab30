-- reference: ql/src/test/queries/clientnegative/archive2.q
-- UNARCHIVE of a partition that was never archived refuses
-- ERROR-CONTAINS: not archived
set hive.archive.enabled=true;
DROP TABLE IF EXISTS neg_unarch;
CREATE TABLE neg_unarch (key STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO neg_unarch PARTITION (ds='d') VALUES ('k');
ALTER TABLE neg_unarch UNARCHIVE PARTITION (ds='d');
