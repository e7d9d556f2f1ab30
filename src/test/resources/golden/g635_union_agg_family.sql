-- union2.q / union3.q / union4.q / union5.q: count over UNION ALL of
-- the same table, union of aggregates, aggregate over union of
-- aggregates.
SELECT 'count_over_union' AS tag, COUNT(*) AS n FROM
  (SELECT n_name FROM nation UNION ALL SELECT n_name FROM nation) u
UNION ALL
SELECT 'union_of_aggs', COUNT(*) FROM
  (SELECT COUNT(*) AS c FROM nation UNION ALL SELECT COUNT(*) AS c FROM region) u
UNION ALL
SELECT 'agg_of_union_aggs', SUM(c) FROM
  (SELECT COUNT(*) AS c FROM nation UNION ALL SELECT COUNT(*) AS c FROM region) u
