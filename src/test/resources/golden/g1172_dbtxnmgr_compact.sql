-- reference: ql/src/test/queries/clientpositive/dbtxnmgr_compact2.q (+
-- dbtxnmgr_compact3.q, dbtxnmgr_ddl1.q) — ALTER TABLE ... COMPACT on a
-- transactional table (partitioned and not) under the txn-manager
-- confs; content is unchanged by compaction.
set hive.support.concurrency=true;
set hive.txn.manager=org.apache.hadoop.hive.ql.lockmgr.DbTxnManager;
DROP TABLE IF EXISTS g1172_t;
DROP TABLE IF EXISTS g1172_p;
CREATE TABLE g1172_t (key INT, value STRING)
  CLUSTERED BY (key) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1172_t SELECT CAST(n_nationkey AS INT), n_name FROM nation;
INSERT INTO g1172_t SELECT CAST(n_nationkey + 100 AS INT), n_name FROM nation;
ALTER TABLE g1172_t COMPACT 'major';
CREATE TABLE g1172_p (key INT)
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (key) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1172_p PARTITION (ds='today')
  SELECT CAST(n_nationkey AS INT) FROM nation;
ALTER TABLE g1172_p PARTITION (ds='today') COMPACT 'minor';
set hive.support.concurrency=false;
SELECT (SELECT count(*) FROM g1172_t) AS n_t,
       (SELECT sum(key) FROM g1172_t) AS s_t,
       (SELECT count(*) FROM g1172_p) AS n_p
