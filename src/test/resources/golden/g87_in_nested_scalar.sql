SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer))
GROUP BY o_orderstatus
