-- reference: ql/src/test/queries/clientnegative/authorization_set_role_neg2.q
-- Under the SQL-std authorizer SET ROLE may select only a role the user
-- holds: user2 is granted neg277_r but not neg277_other, so selecting
-- the latter is refused (SQLStdHiveAccessController setCurrentRole).
-- ERROR-CONTAINS: doesn't belong to role
CREATE ROLE neg277_r;
CREATE ROLE neg277_other;
GRANT ROLE neg277_r TO USER neg277_user;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg277_user;
SET ROLE neg277_r;
SET ROLE neg277_other;
