-- reference: ql/src/test/queries/clientnegative/load_non_native.q (path-validation family)
-- LOAD DATA from a nonexistent path is refused
-- ERROR-CONTAINS: LOAD_DATA | does not exist | invalid path
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_load;
CREATE TABLE graft_tmp.neg_load (a STRING) USING parquet LOCATION '${NEGTMP}/neg_load';
LOAD DATA LOCAL INPATH '/no/such/file/anywhere.txt' INTO TABLE graft_tmp.neg_load;
