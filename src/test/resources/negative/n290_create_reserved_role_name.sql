-- reference: ql/src/test/queries/clientnegative/authorization_cannot_create_default_role.q
-- ALL / DEFAULT / NONE are SET ROLE keywords — a role by those names
-- could never be selected, so creating one is refused.
-- ERROR-CONTAINS: reserved roles
CREATE ROLE default;
