SELECT c_custkey FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.8
