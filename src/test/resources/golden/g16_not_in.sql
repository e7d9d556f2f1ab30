SELECT c_custkey FROM customer
WHERE c_custkey < 200 AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
