-- reference: ql/src/test/queries/clientpositive/dbtxnmgr_query1.q +
-- dbtxnmgr_query2.q + dbtxnmgr_query3.q + dbtxnmgr_query4.q +
-- dbtxnmgr_query5.q — the plain DML battery under the DbTxnManager
-- confs (create/load-shaped insert, table-to-table insert, partitioned
-- insert + overwrite, drop): the txn confs must not change any result.
set hive.support.concurrency=true;
set hive.txn.manager=org.apache.hadoop.hive.ql.lockmgr.DbTxnManager;
DROP TABLE IF EXISTS g1056_t1;
DROP TABLE IF EXISTS g1056_t2;
DROP TABLE IF EXISTS g1056_t3;
CREATE TABLE g1056_t1 (key STRING, val STRING) USING parquet;
INSERT INTO g1056_t1 SELECT cast(n_nationkey AS STRING), n_name FROM nation;
CREATE TABLE g1056_t2 (key STRING, val STRING) USING parquet;
INSERT INTO g1056_t2 SELECT * FROM g1056_t1;
CREATE TABLE g1056_t3 (key STRING, val STRING) USING parquet PARTITIONED BY (pval STRING);
INSERT INTO g1056_t3 PARTITION (pval = '1') SELECT * FROM g1056_t1;
INSERT OVERWRITE TABLE g1056_t3 PARTITION (pval = '1') SELECT * FROM g1056_t1 WHERE key < '2';
set hive.support.concurrency=false;
SELECT 't2' AS tag, count(*) AS n FROM g1056_t2
UNION ALL SELECT 't3', count(*) FROM g1056_t3;
