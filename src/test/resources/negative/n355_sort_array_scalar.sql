-- reference: ql/src/test/queries/clientnegative/udf_sort_array_wrong2.q
-- — sort_array over a scalar STRING refuses: the argument must be an
-- array.
-- ERROR-CONTAINS: sort_array | array | datatype_mismatch
SELECT sort_array('Invalid') FROM nation TABLESAMPLE (1 ROWS);
