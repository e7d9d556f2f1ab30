SELECT o_custkey, o_orderkey, rn FROM
  (SELECT o_custkey, o_orderkey,
     row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
   FROM orders) t
WHERE rn <= 2 AND o_custkey < 30
