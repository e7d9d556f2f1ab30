-- union_remove_6_subq.q correctness tail: aggregate over a union of two
-- single-row aggregate branches
SELECT round(avg(c) * 100) / 100 AS a FROM (
  SELECT count(1) - 200 AS c FROM orders
  UNION ALL
  SELECT count(1) AS c FROM orders
) subq
