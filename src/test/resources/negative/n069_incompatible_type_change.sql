-- reference: ql/src/test/queries/clientnegative/disallow_incompatible_type_change_on1.q
-- an incompatible column type change on a parquet table is refused
-- ERROR-CONTAINS: NOT_SUPPORTED_CHANGE_COLUMN | cannot update | incompatible
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_ct;
CREATE TABLE graft_tmp.neg_ct (a INT) USING parquet LOCATION '${NEGTMP}/neg_ct';
ALTER TABLE graft_tmp.neg_ct CHANGE COLUMN a a ARRAY<INT>;
