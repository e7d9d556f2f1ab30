-- having2.q: HAVING combining MULTIPLE different aggregates (sum and
-- avg and count) over a customer-level rollup.
SELECT o_custkey, sum(o_totalprice) AS s
FROM orders
GROUP BY o_custkey
HAVING sum(o_totalprice) > 800000
   AND avg(o_totalprice) <= 300000
   AND count(*) >= 3
