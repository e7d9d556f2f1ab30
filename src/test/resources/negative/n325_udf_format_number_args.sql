-- reference: ql/src/test/queries/clientnegative/udf_format_number_wrong2.q
-- — format_number with three arguments refuses (the function takes
-- exactly two; SemanticAnalyzer Error 10015 arguments-length mismatch).
-- ERROR-CONTAINS: format_number | wrong_num_args | requires 2 | arguments
SELECT format_number(12332.123456, 2, 3) FROM nation TABLESAMPLE (1 ROWS);
