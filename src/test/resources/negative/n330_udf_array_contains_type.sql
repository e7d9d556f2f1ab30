-- reference: ql/src/test/queries/clientnegative/udf_array_contains_wrong2.q
-- — array_contains over ARRAY<INT> with a STRING probe refuses: the
-- probe must match the element type (GenericUDFArrayContains).
-- ERROR-CONTAINS: array_contains | same element type | datatype_mismatch
SELECT array_contains(array(1, 2, 3), '2') FROM nation TABLESAMPLE (1 ROWS);
