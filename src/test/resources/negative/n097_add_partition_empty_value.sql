-- reference: ql/src/test/queries/clientnegative/addpart1.q
-- an empty string is not a legal partition value
-- ERROR-CONTAINS: empty | invalid partition | partition spec
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_addpe;
CREATE TABLE graft_tmp.neg_addpe (a INT) USING parquet
PARTITIONED BY (b STRING, c STRING) LOCATION '${NEGTMP}/neg_addpe';
ALTER TABLE graft_tmp.neg_addpe ADD PARTITION (b='f', c='');
