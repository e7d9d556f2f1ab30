-- reference: ql/src/test/queries/clientnegative/database_drop_does_not_exist.q
-- ERROR-CONTAINS: SCHEMA_NOT_FOUND | cannot be found
DROP DATABASE neg_no_such_db_zzz;
