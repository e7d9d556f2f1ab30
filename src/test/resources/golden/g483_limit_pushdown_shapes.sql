-- limit_pushdown.q: LIMIT over ORDER BY (top-k), over a group-by, and
-- inside a join input — deterministic via unique order keys.
SELECT 'topk' AS tag, cast(k AS STRING) AS v FROM (
  SELECT l_orderkey AS k FROM lineitem ORDER BY l_orderkey LIMIT 5
) a
UNION ALL
SELECT 'gby_limit', concat(rf, ':', cast(n AS STRING)) FROM (
  SELECT l_returnflag AS rf, count(1) AS n FROM lineitem
  GROUP BY l_returnflag ORDER BY rf LIMIT 2
) b
UNION ALL
SELECT 'join_input_limit', cast(x.k AS STRING) FROM (
  SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 3
) x JOIN lineitem l ON x.k = l.l_orderkey
