-- union of two independently-windowed branches
SELECT src, k, r FROM (
  SELECT 'sup' AS src, s_name AS k,
    rank() over (partition by s_nationkey order by s_acctbal desc, s_suppkey) AS r
  FROM supplier
  UNION ALL
  SELECT 'cust' AS src, c_name AS k,
    rank() over (partition by c_nationkey order by c_acctbal desc, c_custkey) AS r
  FROM customer WHERE c_custkey <= 100
) u WHERE r = 1
