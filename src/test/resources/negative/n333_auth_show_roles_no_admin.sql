-- reference: ql/src/test/queries/clientnegative/
-- authorization_show_roles_no_admin.q — SHOW ROLES under the SQL-std
-- authorizer is admin-only; a plain user is refused.
-- ERROR-CONTAINS: admin
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg333_user;
SHOW ROLES;
