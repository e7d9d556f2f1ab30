-- reference: ql/src/test/queries/clientnegative/
-- invalid_select_column_with_tablename.q — using the bare TABLE name
-- as a comparison operand refuses: a relation is not a column.
-- ERROR-CONTAINS: test_invalid | cannot be resolved | invalid column
DROP TABLE IF EXISTS neg345_test_invalid;
CREATE TABLE neg345_test_invalid (key STRING, value STRING)
  PARTITIONED BY (year STRING, month STRING) STORED AS PARQUET;
SELECT * FROM neg345_test_invalid WHERE neg345_test_invalid = 123;
