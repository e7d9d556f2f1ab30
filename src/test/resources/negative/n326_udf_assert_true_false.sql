-- reference: ql/src/test/queries/clientnegative/udf_assert_true2.q —
-- assert_true inside an expression over an exploded array aborts the
-- query at the first false condition (x = 2 fails x < 2).
-- ERROR-CONTAINS: assert | 'x < 2' | is not true
SELECT 1 + assert_true(x < 2)
FROM nation LATERAL VIEW explode(array(1, 2)) a AS x
LIMIT 2;
