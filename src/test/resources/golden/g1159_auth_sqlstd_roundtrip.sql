-- reference: ql/src/test/queries/clientpositive/authorization_1_sql_std.q
-- (+ authorization_grant_table_priv.q, authorization_2.q shapes) —
-- grant then revoke a table privilege and a role; SHOW GRANT reflects
-- each step (the role's grant survives, the user's direct grant and
-- role membership are revoked).
DROP TABLE IF EXISTS g1159_src_autho;
CREATE TABLE g1159_src_autho (key STRING, value STRING) USING parquet;
GRANT SELECT ON TABLE g1159_src_autho TO USER g1159_user_sauth;
CREATE ROLE g1159_src_role;
GRANT ROLE g1159_src_role TO USER g1159_user_sauth;
GRANT SELECT ON TABLE g1159_src_autho TO ROLE g1159_src_role;
REVOKE SELECT ON TABLE g1159_src_autho FROM USER g1159_user_sauth;
REVOKE ROLE g1159_src_role FROM USER g1159_user_sauth;
-- drop the role so the session role list stays script-clean (g375's
-- SHOW ROLES pin runs later in the same session)
DROP ROLE g1159_src_role;
-- post-revoke the user holds only public (SHOW GRANT's grant_time
-- column is wall-clock, so the role accounting is the pinned probe;
-- the golden runner restores user.name after the script)
set user.name=g1159_user_sauth;
SHOW CURRENT ROLES
