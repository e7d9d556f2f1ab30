-- mapjoin_subquery.q shape: MAPJOIN hint inside a chained subquery
SELECT /*+ MAPJOIN(n) */ r_name, count(*) AS n_cust FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 0) c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region ON n.n_regionkey = r_regionkey
GROUP BY r_name
