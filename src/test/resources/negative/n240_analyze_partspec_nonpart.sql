-- reference: ql/src/test/queries/clientnegative/analyze1.q
-- ANALYZE TABLE with a PARTITION spec naming a NON-partition column is
-- refused (the spec must name partition keys of the table).
-- ERROR-CONTAINS: not a partition column | PARTITIONS_NOT_FOUND | not partitioned | invalid partition | REQUIRES_SINGLE_PART_NAMESPACE | expects a table
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_analyze1;
CREATE TABLE graft_tmp.neg_analyze1 (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT INTO graft_tmp.neg_analyze1 PARTITION (ds='1') VALUES ('a', 'b');
ANALYZE TABLE graft_tmp.neg_analyze1 PARTITION (key) COMPUTE STATISTICS;
