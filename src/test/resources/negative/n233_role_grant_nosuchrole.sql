-- reference: ql/src/test/queries/clientnegative/authorization_role_grant_nosuchrole.q
-- granting a role TO a role that does not exist is refused (the
-- metastore's grant_role lookup fails on the grantee).
-- ERROR-CONTAINS: Cannot find role
CREATE ROLE neg_rg_role1;
GRANT ROLE neg_rg_role1 TO ROLE neg_rg_nosuchrole;
