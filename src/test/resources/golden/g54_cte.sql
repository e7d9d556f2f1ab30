WITH big AS (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS tot
             FROM orders GROUP BY o_custkey HAVING count(*) >= 2),
     named AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100)
SELECT named.c_custkey, named.c_name, big.n, round(big.tot) AS tot0
FROM named JOIN big ON named.c_custkey = big.o_custkey
