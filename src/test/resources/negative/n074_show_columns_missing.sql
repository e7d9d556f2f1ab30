-- reference: ql/src/test/queries/clientnegative/show_columns3.q
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
SHOW COLUMNS IN neg_no_such_table_zzz;
