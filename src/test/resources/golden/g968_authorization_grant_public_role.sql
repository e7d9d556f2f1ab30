-- authorization_grant_public_role.q: every user implicitly holds the
-- PUBLIC role, so a grant to ROLE public reaches a user nothing was
-- granted to directly — the select runs under enforcement with no
-- per-user grant at all.
DROP TABLE IF EXISTS g968_t;
CREATE TABLE g968_t USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS i, n_name AS s
  FROM nation WHERE n_nationkey < 3;
GRANT SELECT ON TABLE g968_t TO ROLE public;
set user.name=g968_nobody;
set hive.security.authorization.enabled=true;
SELECT count(*) AS n FROM g968_t;
set hive.security.authorization.enabled=false;
set user.name=;
REVOKE SELECT ON TABLE g968_t FROM ROLE public;
SELECT i, s FROM g968_t ORDER BY i
