-- union_remove_12.q shape: branches project the same columns in DIFFERENT
-- internal order; the union resolves by position through explicit aliases
SELECT k, v FROM (
  SELECT n_name AS k, n_nationkey AS v FROM nation
  UNION ALL
  SELECT r_name AS k, r_regionkey AS v FROM region
) u
