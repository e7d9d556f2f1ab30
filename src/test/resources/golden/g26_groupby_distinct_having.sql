SELECT o_custkey, count(DISTINCT o_orderpriority) AS ndp
FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderpriority) >= 5
