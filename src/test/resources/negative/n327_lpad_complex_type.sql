-- reference: ql/src/test/queries/clientnegative/char_pad_convert_fail1.q
-- (+ fail3's uniontype variant) — lpad over a LIST refuses: only
-- primitive types convert to the pad target (GenericUDFBasePad).
-- ERROR-CONTAINS: lpad | datatype_mismatch | primitive
SELECT lpad(array(1, 2, 3), 4, ' ') FROM nation TABLESAMPLE (1 ROWS);
