-- reference: ql/src/test/queries/clientnegative/show_tables_bad_db1.q
-- ERROR-CONTAINS: SCHEMA_NOT_FOUND | cannot be found
SHOW TABLES IN neg_no_such_db_zzz;
