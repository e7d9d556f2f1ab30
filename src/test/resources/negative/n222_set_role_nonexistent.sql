-- reference: SET ROLE to a role that does not exist refuses
-- (authorization_set_role_neg1.q)
-- ERROR-CONTAINS: does not exist
SET ROLE neg_no_such_role_xyz;
