SELECT c_mktsegment, o_orderstatus, count(*) AS n,
  round(sum(l_quantity) * 100) / 100 AS qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_mktsegment, o_orderstatus
