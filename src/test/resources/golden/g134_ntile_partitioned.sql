SELECT c_nationkey, c_custkey, ntile(3) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS nt
FROM customer WHERE c_nationkey < 5
