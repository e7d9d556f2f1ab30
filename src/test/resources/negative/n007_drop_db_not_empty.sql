-- reference: ql/src/test/queries/clientnegative/database_drop_not_empty.q
-- ERROR-CONTAINS: SCHEMA_NOT_EMPTY | is not empty
CREATE DATABASE IF NOT EXISTS neg_nonempty_db;
CREATE TABLE IF NOT EXISTS neg_nonempty_db.t (a INT) USING parquet LOCATION '${NEGTMP}/neg_nonempty_t';
DROP DATABASE neg_nonempty_db;
