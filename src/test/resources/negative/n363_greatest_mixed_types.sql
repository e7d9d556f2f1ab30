-- reference: ql/src/test/queries/clientnegative/udf_greatest_error_2.q
-- (+ udf_greatest_error_3.q, udf_greatest_error_4.q) — greatest()
-- over irreconcilable types (int, string,
-- date) refuses.
-- ERROR-CONTAINS: greatest | same type | DATA_DIFF_TYPES
SELECT greatest(1, 'x', DATE '2020-01-01')
FROM nation TABLESAMPLE (1 ROWS);
