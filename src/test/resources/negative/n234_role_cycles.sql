-- reference: ql/src/test/queries/clientnegative/authorization_role_cycles1.q
-- role-to-role grants must stay acyclic: after role1 is granted to
-- role2, granting role2 back to role1 closes a cycle and is refused.
-- ERROR-CONTAINS: no cycles allowed
CREATE ROLE neg_cyc_r1;
CREATE ROLE neg_cyc_r2;
GRANT ROLE neg_cyc_r1 TO ROLE neg_cyc_r2;
GRANT ROLE neg_cyc_r2 TO ROLE neg_cyc_r1;
