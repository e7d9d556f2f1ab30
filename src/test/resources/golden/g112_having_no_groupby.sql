SELECT count(*) AS n, sum(o_totalprice) AS tot FROM orders
HAVING count(*) > 100 AND min(o_orderkey) >= 1
