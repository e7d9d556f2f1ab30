SELECT c_custkey, nvl(x, -1) AS a, nullif(c_nationkey, 5) AS b,
  if(c_acctbal > 0, 'pos', 'neg') AS c, coalesce(x, c_nationkey, -9) AS d,
  nvl2(x, 'has', 'none') AS e
FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_custkey END AS x
      FROM customer WHERE c_custkey <= 40) t
