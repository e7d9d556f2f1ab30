-- reference: ql/src/test/queries/clientnegative/authorization_caseinsensitivity.q
-- role names are case-insensitive: CREATE ROLE under a different casing
-- of an existing role collides.
-- ERROR-CONTAINS: already exists
CREATE ROLE neg_case_role;
CREATE ROLE NEG_CASE_ROLE;
