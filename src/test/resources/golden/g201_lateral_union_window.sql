-- composition: explode branches unioned, aggregated, then ranked
SELECT tok, n, rank() OVER (ORDER BY n DESC, tok) AS r FROM (
  SELECT tok, count(*) AS n FROM (
    SELECT explode(split(o_orderpriority, '-')) AS tok FROM orders
    UNION ALL
    SELECT explode(split(o_orderstatus, '-')) AS tok FROM orders) u
  GROUP BY tok) t
