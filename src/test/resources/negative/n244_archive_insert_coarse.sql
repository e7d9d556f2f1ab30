-- reference: ql/src/test/queries/clientnegative/archive_insert3.q
-- after archiving at the COARSE (ds) level, an INSERT OVERWRITE into
-- any covered (ds, hr) leaf partition is refused by the write-gate.
-- ERROR-CONTAINS: conflict with existing archive
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_arcins;
CREATE TABLE graft_tmp.neg_arcins (key INT)
  USING parquet PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO graft_tmp.neg_arcins PARTITION (ds='2008-04-08', hr='12') VALUES (1);
set hive.archive.enabled=true;
ALTER TABLE graft_tmp.neg_arcins ARCHIVE PARTITION (ds='2008-04-08');
INSERT OVERWRITE TABLE graft_tmp.neg_arcins PARTITION (ds='2008-04-08', hr='11')
SELECT 2;
