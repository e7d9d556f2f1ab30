-- reference: ql/src/test/queries/clientnegative/analyze_non_existent_tbl.q
-- ERROR-CONTAINS: TABLE_OR_VIEW_NOT_FOUND | cannot be found
ANALYZE TABLE neg_no_such_tbl COMPUTE STATISTICS;
