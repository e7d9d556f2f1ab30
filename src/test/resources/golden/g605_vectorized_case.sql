-- vectorized_case.q: simple CASE (value-match) and searched CASE with
-- NULL branches and fallthrough.
SELECT n_nationkey,
  CASE n_regionkey WHEN 0 THEN 'africa' WHEN 1 THEN 'america' ELSE 'other' END AS simple_case,
  CASE WHEN n_nationkey < 5 THEN 'low' WHEN n_nationkey < 15 THEN 'mid' END AS searched_nullable,
  CASE n_regionkey WHEN NULL THEN 'never' ELSE 'always' END AS null_match,
  CASE WHEN n_name LIKE 'A%' THEN 1 ELSE 0 END AS like_case
FROM nation WHERE n_nationkey < 8
