-- reference: ql/src/test/queries/clientnegative/authorization_drop_admin_role.q
-- the implicit admin role cannot be dropped
-- ERROR-CONTAINS: reserved role admin
DROP ROLE admin;
