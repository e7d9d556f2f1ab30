-- vector_between_in.q, vector_cast_constant.q, vector_count_distinct.q,
-- vector_data_types.q, vector_decimal_aggregate.q, vector_distinct_2.q,
-- vector_elt.q: vectorized-expression semantics — BETWEEN + IN combos,
-- constant-folding casts, decimal aggregates, elt/field indexing.
SELECT 'between_in' AS tag, COUNT(*) AS n FROM lineitem
  WHERE l_quantity BETWEEN 10 AND 20 AND l_linenumber IN (1, 3, 5)
UNION ALL
SELECT 'cast_const', COUNT(*) FROM nation WHERE n_nationkey < CAST('15' AS INT)
UNION ALL
SELECT 'count_distinct', COUNT(DISTINCT l_suppkey) FROM lineitem
UNION ALL
SELECT 'decimal_agg', CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'elt', COUNT(*) FROM nation WHERE ELT(1 + n_regionkey % 2, 'a', 'b') = 'b'
UNION ALL
SELECT 'distinct2', COUNT(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) d
