-- reference: ql/src/test/queries/clientnegative/
-- authorization_insert_noinspriv.q — INSERT into another user's table
-- without the INSERT privilege refuses under the SQL-std authorizer.
-- ERROR-CONTAINS: INSERT | privilege
DROP TABLE IF EXISTS neg335_t;
CREATE TABLE neg335_t (i INT) USING parquet;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set hive.security.authorization.enabled=true;
set user.name=neg335_user1;
CREATE TABLE neg335_usertab (i INT) USING parquet;
INSERT INTO TABLE neg335_t SELECT * FROM neg335_usertab;
