-- reference: ql/src/test/queries/clientnegative/database_drop_does_not_exist.q
-- (database-protection family): the default database cannot be dropped
-- ERROR-CONTAINS: DROP_DATABASE | default database
DROP DATABASE default;
