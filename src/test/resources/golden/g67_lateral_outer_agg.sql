SELECT o_orderstatus, count(x) AS nx, count(*) AS n
FROM (SELECT o_orderstatus,
        CASE WHEN o_orderstatus = 'P' THEN array()
             ELSE array(o_orderkey, o_custkey) END AS a
      FROM orders WHERE o_orderkey < 100) s
LATERAL VIEW OUTER explode(a) t AS x
GROUP BY o_orderstatus
