-- coalesce/nvl/nullif/nvl2/if breadth
SELECT c_custkey,
  coalesce(NULL, c_mktsegment, 'none') AS co,
  nvl(NULL, c_mktsegment) AS nv,
  nullif(c_mktsegment, 'BUILDING') AS ni,
  nvl2(nullif(c_mktsegment, 'BUILDING'), 'kept', 'zapped') AS nv2,
  if(c_acctbal > 0, 'pos', 'nonpos') AS cond
FROM customer WHERE c_custkey <= 30
