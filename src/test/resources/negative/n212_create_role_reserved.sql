-- reference: ql/src/test/queries/clientnegative/authorization_cannot_create_all_role.q
-- family — the reserved role names (public/admin/all/none/default)
-- cannot be created.
-- ERROR-CONTAINS: reserved | already exists | cannot be created
CREATE ROLE public;
