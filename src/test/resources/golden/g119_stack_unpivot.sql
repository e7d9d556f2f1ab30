SELECT c_custkey, metric, val FROM
  (SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE) AS nk
   FROM customer WHERE c_custkey <= 10) t
LATERAL VIEW stack(2, 'acctbal', c_acctbal, 'nationkey', nk) s AS metric, val
