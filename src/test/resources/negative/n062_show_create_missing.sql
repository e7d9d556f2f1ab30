-- reference: ql/src/test/queries/clientnegative/show_create_table_does_not_exist.q
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
SHOW CREATE TABLE neg_no_such_table_zzz;
