-- reference: ql/src/test/queries/clientpositive/
-- authorization_drop_db_empty.q + authorization_drop_db_cascade.q —
-- dropping an EMPTY database and a populated one with CASCADE under
-- the SQL-std authorizer (admin session).
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
DROP DATABASE IF EXISTS g1162_empty CASCADE;
DROP DATABASE IF EXISTS g1162_full CASCADE;
CREATE DATABASE g1162_empty;
CREATE DATABASE g1162_full;
CREATE TABLE g1162_full.t1 USING parquet AS
  SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 3;
set hive.security.authorization.enabled=true;
DROP DATABASE g1162_empty;
DROP DATABASE g1162_full CASCADE;
set hive.security.authorization.enabled=false;
SHOW DATABASES LIKE 'g1162*'
