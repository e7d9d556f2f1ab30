-- ppd_transform.q: a predicate over a TRANSFORM subquery — the filter
-- applies to the script's OUTPUT rows (it cannot be pushed below the
-- script, whose output is opaque to the optimizer).
SELECT k, v FROM (
  SELECT TRANSFORM(n_nationkey, n_regionkey) USING 'cat' AS (k STRING, v STRING)
  FROM nation
) t
WHERE CAST(k AS INT) < 5
ORDER BY CAST(k AS INT);
