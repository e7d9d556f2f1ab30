-- reference: ql/src/test/queries/clientnegative/
-- invalid_select_column_with_subquery.q — comparing a derived-table
-- ALIAS itself (subq = 123) refuses: the alias is a relation, not a
-- column.
-- ERROR-CONTAINS: subq | cannot be resolved | invalid column
DROP TABLE IF EXISTS neg_iscs_t;
CREATE TABLE neg_iscs_t (key STRING, value STRING)
  PARTITIONED BY (year STRING, month STRING) STORED AS PARQUET;
SELECT * FROM (SELECT * FROM neg_iscs_t) subq WHERE subq = 123;
