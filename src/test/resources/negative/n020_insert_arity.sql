-- reference: ql/src/test/queries/clientnegative/insert_number_of_columns_mismatch (smb/exim column-compat family)
-- ERROR-CONTAINS: INSERT_COLUMN_ARITY_MISMATCH | not enough data columns | too many data columns
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_arity;
CREATE TABLE graft_tmp.neg_arity (a INT, b STRING) USING parquet LOCATION '${NEGTMP}/neg_arity';
INSERT INTO graft_tmp.neg_arity SELECT n_nationkey FROM nation;
