-- reference: ql/src/test/queries/clientnegative/
-- authorization_cannot_create_none_role.q — NONE is a SET ROLE keyword;
-- a role by that name could never be re-selected, so CREATE ROLE None is
-- refused (case-insensitive, like ALL and DEFAULT).
-- ERROR-CONTAINS: reserved role
CREATE ROLE None;
