SELECT o_orderstatus, p, x, count(*) AS n
FROM (SELECT o_orderstatus,
        CASE WHEN o_orderstatus = 'P' THEN array() ELSE array('a', 'b') END AS xs
      FROM orders WHERE o_orderkey <= 200) t
LATERAL VIEW OUTER posexplode(xs) e AS p, x
GROUP BY o_orderstatus, p, x
