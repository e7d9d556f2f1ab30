SELECT o_custkey, round(avg(o_totalprice) * 100) / 100 AS ap
FROM orders GROUP BY o_custkey HAVING avg(o_totalprice) > 400000
