-- reference: ql/src/test/queries/clientnegative/invalid_sum_syntax.q —
-- sum(*) refuses (star is count-only).
-- ERROR-CONTAINS: sum | invalid | *
SELECT sum(*) FROM nation;
