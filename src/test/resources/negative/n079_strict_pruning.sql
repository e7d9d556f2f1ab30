-- reference: ql/src/test/queries/clientnegative/strict_pruning.q (also input_part0_neg.q)
-- strict mode refuses scanning a partitioned table with no partition filter
-- ERROR-CONTAINS: no partition predicate found for partitioned table
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_strictpart;
CREATE TABLE graft_tmp.neg_strictpart (a STRING) USING parquet PARTITIONED BY (ds STRING) LOCATION '${NEGTMP}/neg_strictpart';
INSERT INTO graft_tmp.neg_strictpart PARTITION (ds='1') VALUES ('x');
SET hive.mapred.mode=strict;
SELECT count(1) FROM graft_tmp.neg_strictpart;
