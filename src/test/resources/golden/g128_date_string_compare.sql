SELECT count(*) AS n, min(o_orderdate) AS mn, max(o_orderdate) AS mx
FROM orders
WHERE o_orderdate BETWEEN '1995-01-01' AND '1996-12-31'
  AND o_orderdate > date'1995-06-15' - INTERVAL 200 DAY
