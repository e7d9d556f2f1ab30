-- vectorization_not.q: NOT/IS NULL/IS NOT NULL combinations over
-- three-valued logic with real column nulls (customer comments are
-- non-null, so synthesize nulls via NULLIF).
SELECT COUNT(*) AS n_all,
       SUM(CASE WHEN NOT (l_linenumber > 3) THEN 1 ELSE 0 END) AS n_not_gt,
       SUM(CASE WHEN NULLIF(l_linenumber, 1) IS NULL THEN 1 ELSE 0 END) AS n_nullif,
       SUM(CASE WHEN NOT (NULLIF(l_linenumber, 1) > 2) THEN 1 ELSE 0 END) AS n_not_null_gt,
       SUM(CASE WHEN (l_linenumber > 2) = (l_quantity > 25) THEN 1 ELSE 0 END) AS n_beq
FROM lineitem WHERE l_orderkey < 1000
