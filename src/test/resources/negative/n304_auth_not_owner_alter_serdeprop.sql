-- reference: ql/src/test/queries/clientnegative/
-- authorization_not_owner_alter_tab_serdeprop.q — under the sql-std
-- authorizer every ALTER TABLE form is ownership-gated: a DIFFERENT
-- user's SET SERDEPROPERTIES on user1's table is refused.
-- ERROR-CONTAINS: OBJECT OWNERSHIP | Permission denied
set user.name=neg_serde_user1;
DROP TABLE IF EXISTS neg_serde_t1;
CREATE TABLE neg_serde_t1 (i INT) USING parquet;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg_serde_user2;
ALTER TABLE neg_serde_t1 SET SERDEPROPERTIES ('field.delim' = ',');
