SELECT c_custkey,
  first_value(c_acctbal) OVER w AS fv,
  last_value(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS lv,
  sum(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum
FROM customer WHERE c_custkey <= 50
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
