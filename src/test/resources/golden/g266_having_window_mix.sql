-- HAVING-filtered aggregate consumed by a window in an outer scope
SELECT st, n, rank() OVER (ORDER BY n DESC, st) AS r FROM (
  SELECT o_orderstatus AS st, count(*) AS n FROM orders
  GROUP BY o_orderstatus HAVING count(*) > 5) t
