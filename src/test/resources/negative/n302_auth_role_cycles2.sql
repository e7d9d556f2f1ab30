-- reference: ql/src/test/queries/clientnegative/authorization_role_cycles2.q
-- — a cycle closed in the MIDDLE of a 5-deep role hierarchy is refused:
-- role1<-role2<-role3<-role4<-role5, then granting role2 to role4 would
-- make role2 -> role3 -> role4 -> role2 circular. The check is
-- transitive, not just direct-edge.
-- ERROR-CONTAINS: no cycles allowed
CREATE ROLE neg_cyc2_r1;
CREATE ROLE neg_cyc2_r2;
GRANT ROLE neg_cyc2_r2 TO ROLE neg_cyc2_r1;
CREATE ROLE neg_cyc2_r3;
GRANT ROLE neg_cyc2_r3 TO ROLE neg_cyc2_r2;
CREATE ROLE neg_cyc2_r4;
GRANT ROLE neg_cyc2_r4 TO ROLE neg_cyc2_r3;
CREATE ROLE neg_cyc2_r5;
GRANT ROLE neg_cyc2_r5 TO ROLE neg_cyc2_r4;
GRANT ROLE neg_cyc2_r2 TO ROLE neg_cyc2_r4;
