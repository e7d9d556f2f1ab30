-- reference: granting a privilege to a role that was never created
-- refuses (the role must exist — authorization role DDL family)
-- ERROR-CONTAINS: does not exist
DROP TABLE IF EXISTS neg_grant_role_t;
CREATE TABLE neg_grant_role_t (k INT) USING parquet;
GRANT SELECT ON TABLE neg_grant_role_t TO ROLE neg_never_created_role;
