-- reference: ql/src/test/queries/clientnegative/authorization_create_role_no_admin.q
-- Under the SQL-std authorizer role administration is admin-only: a
-- plain user's CREATE ROLE is refused with the reference's text.
-- ERROR-CONTAINS: not allowed to add roles
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg288_user;
CREATE ROLE neg288_r;
