-- reference: ql/src/test/queries/clientnegative/authorization_role_grant.q
-- Under the SQL-std authorizer, granting a role requires admin or
-- holding that role WITH ADMIN OPTION: user2 holds neg285_r plainly, so
-- re-granting it to user3 is refused with the reference's DDLTask text.
-- ERROR-CONTAINS: not allowed to grant role
CREATE ROLE neg285_r;
GRANT ROLE neg285_r TO USER neg285_user2;
set hive.security.authorization.enabled=true;
set hive.security.authorization.manager=org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest;
set user.name=neg285_user2;
GRANT ROLE neg285_r TO USER neg285_user3;
