-- reference: ql/src/test/queries/clientnegative/drop_table_failure1.q
-- DROP TABLE without IF EXISTS on a missing table is refused
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
DROP TABLE neg_no_such_table_zzz;
