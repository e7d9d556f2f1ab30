-- reference: ql/src/test/queries/clientnegative/desc_failure1.q
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
DESC neg_no_such_table_xyz;
