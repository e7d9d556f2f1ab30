SELECT o_orderstatus,
  sum(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS n_big,
  round(avg(DISTINCT o_custkey % 10), 4) AS avg_d,
  count(DISTINCT o_custkey, o_orderpriority) AS nd_multi,
  max(length(o_orderpriority)) AS mx_len
FROM orders GROUP BY o_orderstatus
