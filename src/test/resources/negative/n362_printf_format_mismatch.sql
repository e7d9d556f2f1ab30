-- reference: ql/src/test/queries/clientnegative/udf_printf_wrong3.q (+
-- udf_printf_wrong4.q) — a printf conversion that cannot accept its
-- argument type (%d against a string) aborts.
-- ERROR-CONTAINS: format | Format | conversion
SELECT printf('%d', 'abc') FROM nation TABLESAMPLE (1 ROWS);
