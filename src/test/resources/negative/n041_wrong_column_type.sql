-- reference: ql/src/test/queries/clientnegative/wrong_column_type.q
-- an array value cannot land in a FLOAT column (no cast exists, even
-- under Hive's permissive insert coercion)
-- ERROR-CONTAINS: cannot cast | CANNOT_UP_CAST | INCOMPATIBLE_DATA | failed to cast
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_wct;
CREATE TABLE graft_tmp.neg_wct (a FLOAT) USING parquet LOCATION '${NEGTMP}/neg_wct';
INSERT OVERWRITE TABLE graft_tmp.neg_wct SELECT array(1.0, 2.0) FROM nation;
