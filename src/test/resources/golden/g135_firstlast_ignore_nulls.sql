WITH t AS (SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS p
           FROM orders WHERE o_orderkey <= 60)
SELECT o_orderkey,
  first_value(p) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS fv_in,
  first_value(p) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS fv_rn,
  last_value(p) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv_in
FROM t
