-- reference: ql/src/test/queries/clientnegative/invalid_cast_from_binary_1.q
-- ERROR-CONTAINS: DATATYPE_MISMATCH | cannot cast | CAST_WITHOUT_SUGGESTION
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_bin;
CREATE TABLE graft_tmp.neg_bin (a BINARY) USING parquet LOCATION '${NEGTMP}/neg_bin';
SELECT CAST(a AS INT) FROM graft_tmp.neg_bin LIMIT 1;
