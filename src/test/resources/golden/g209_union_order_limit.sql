-- ORDER BY + LIMIT binding to the whole UNION, not the last branch
SELECT k, v FROM (
  SELECT o_orderstatus AS k, count(*) AS v FROM orders GROUP BY o_orderstatus
  UNION ALL
  SELECT o_orderpriority AS k, count(*) AS v FROM orders GROUP BY o_orderpriority)
ORDER BY v DESC, k LIMIT 5
