-- authorization_rolehierarchy_privs.q (accounting half): role-to-role
-- grants are recorded (and refuse cycles at grant time); the transitive
-- privilege flow is pinned under enforcement in Round14Spec. SHOW ROLES
-- closes the script deterministically (SHOW PRINCIPALS carries a
-- grant_time column, unsuitable for a golden).
CREATE ROLE g802_leaf;
CREATE ROLE g802_mid;
GRANT ROLE g802_leaf TO ROLE g802_mid;
GRANT SELECT ON TABLE nation TO ROLE g802_leaf;
SHOW ROLES
