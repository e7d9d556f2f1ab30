-- reference: ql/src/test/queries/clientnegative/invalid_arithmetic_type.q
-- arithmetic over an array operand
-- ERROR-CONTAINS: BINARY_OP_DIFF_TYPES | data type mismatch
SELECT array(1) + 1 FROM nation;
