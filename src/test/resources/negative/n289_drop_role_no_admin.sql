-- reference: ql/src/test/queries/clientnegative/authorization_drop_role_no_admin.q
-- DROP ROLE is admin-only under the SQL-std authorizer.
-- ERROR-CONTAINS: not allowed to drop role
CREATE ROLE neg289_r;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg289_user;
DROP ROLE neg289_r;
