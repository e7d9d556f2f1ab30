-- authorization_set_show_current_role.q: SET ROLE selects the ACTIVE
-- role set — privileges granted to a role reach the user only while
-- that role is active. The script grants select through a role, narrows
-- to it under enforcement (the select works), then restores ALL and
-- resets identity; the deny side of narrowing lives in negative n277.
DROP TABLE IF EXISTS g967_t;
CREATE TABLE g967_t USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS i FROM nation WHERE n_nationkey < 3;
CREATE ROLE g967_r1;
GRANT ROLE g967_r1 TO USER g967_user;
GRANT SELECT ON TABLE g967_t TO ROLE g967_r1;
set user.name=g967_user;
set hive.security.authorization.enabled=true;
SET ROLE g967_r1;
SELECT count(*) AS n FROM g967_t;
SET ROLE ALL;
set hive.security.authorization.enabled=false;
set user.name=;
SELECT i FROM g967_t ORDER BY i
