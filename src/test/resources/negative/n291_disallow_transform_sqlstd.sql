-- reference: ql/src/test/queries/clientnegative/authorization_disallow_transform.q
-- Under the SQL-std authorizer a TRANSFORM script is a LOCAL_URI object
-- no one holds privileges on — the whole query is refused.
-- ERROR-CONTAINS: type=LOCAL_URI
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg291_t;
CREATE TABLE graft_tmp.neg291_t (i INT) USING parquet;
GRANT SELECT ON TABLE graft_tmp.neg291_t TO ROLE public;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg291_user;
SELECT TRANSFORM (i) USING 'cat' AS (key) FROM graft_tmp.neg291_t;
