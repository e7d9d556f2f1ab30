SELECT o_orderstatus, count(*) AS n FROM
  (SELECT o_orderstatus FROM orders WHERE o_orderkey <= 100 ORDER BY o_totalprice DESC) t
GROUP BY o_orderstatus
