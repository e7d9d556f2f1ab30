SELECT c_mktsegment, c_custkey,
  rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk
FROM customer WHERE c_custkey < 50
