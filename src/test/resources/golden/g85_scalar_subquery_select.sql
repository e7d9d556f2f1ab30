SELECT n_name,
  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
  (SELECT max(s_acctbal) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS max_bal
FROM nation n WHERE n_nationkey < 10
