-- reference: ql/src/test/queries/clientnegative/invalid_select_column_with_subquery.q
-- comparing the derived-table ALIAS itself against a literal
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved
SELECT * FROM (SELECT * FROM nation) subq WHERE subq = 123;
