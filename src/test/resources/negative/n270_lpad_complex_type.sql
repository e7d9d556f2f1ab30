-- reference: ql/src/test/queries/clientnegative/char_pad_convert_fail0.q
-- (and _fail1/2/3): lpad/rpad take primitive arguments only — a LIST/
-- MAP/STRUCT pad-length argument is an argument type mismatch.
-- ERROR-CONTAINS: DATATYPE_MISMATCH | data type mismatch | cannot resolve
SELECT lpad(n_name, array(1, 2, 3), ' ') FROM nation LIMIT 5;
