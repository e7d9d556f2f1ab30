-- reference: hive.strict.checks.bucketing (default true in the
-- strict-checks line; HIVE-16453 family) — LOAD DATA is a raw file
-- move, which cannot assign bucket ids; a loaded foreign file makes
-- bucketed reads (SMB joins, bucket TABLESAMPLE) silently wrong
-- ERROR-CONTAINS: bucketed table | bucket layout
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_loadbkt;
CREATE TABLE graft_tmp.neg_loadbkt (k INT, v STRING)
USING parquet CLUSTERED BY (k) INTO 4 BUCKETS
LOCATION '${NEGTMP}/neg_loadbkt';
LOAD DATA LOCAL INPATH '/tmp/anything.txt' INTO TABLE graft_tmp.neg_loadbkt;
