-- reference: ql/src/test/queries/clientnegative/database_create_already_exists.q
-- ERROR-CONTAINS: SCHEMA_ALREADY_EXISTS | already exists
CREATE DATABASE IF NOT EXISTS neg_dbexists;
CREATE DATABASE neg_dbexists;
