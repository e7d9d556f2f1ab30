-- reference: ql/src/test/queries/clientnegative/database_switch_does_not_exist.q
-- ERROR-CONTAINS: SCHEMA_NOT_FOUND | cannot be found
USE neg_no_such_db_xyz;
