-- strict no.partition.filter, join-type aware: an ON predicate on the
-- PRESERVED side of a LEFT JOIN does not filter that side's scan, so a
-- partitioned left table with only such a predicate is still refused
-- ERROR-CONTAINS: no partition predicate
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_sp_lj;
CREATE TABLE graft_tmp.neg_sp_lj (v INT) USING parquet
PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_sp_lj';
INSERT INTO graft_tmp.neg_sp_lj PARTITION (ds='a') VALUES (1);
SET hive.strict.checks.no.partition.filter=true;
SELECT count(1) FROM graft_tmp.neg_sp_lj t
LEFT JOIN nation n ON t.ds = 'a' AND t.v = n.n_nationkey;
