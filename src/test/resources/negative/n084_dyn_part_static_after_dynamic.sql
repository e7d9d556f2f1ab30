-- reference: ql/src/test/queries/clientnegative/dyn_part3-style ordering
-- (SemanticAnalyzer ErrorMsg 10094): a static partition column cannot
-- follow a dynamic one — the directory tree cannot nest a constant under
-- a varying parent
-- ERROR-CONTAINS: Dynamic partition cannot be the parent of a static partition
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_dynorder;
CREATE TABLE graft_tmp.neg_dynorder (a STRING) USING parquet PARTITIONED BY (p STRING, q STRING) LOCATION '${NEGTMP}/neg_dynorder';
INSERT OVERWRITE TABLE graft_tmp.neg_dynorder PARTITION (p, q='1') SELECT n_name, CAST(n_regionkey AS STRING) FROM nation;
