-- groupby3_map_skew.q, groupby3_noskew.q, groupby3_map_multi_distinct.q,
-- groupby3_noskew_multi_distinct.q, groupby7_map_skew.q,
-- groupby7_noskew.q, groupby7_map_multi_single_reducer.q,
-- groupby7_noskew_multi_single_reducer.q, groupby8_map.q,
-- groupby8_map_skew.q, groupby8_noskew.q, groupby_map_ppr.q,
-- groupby_sort_skew_1_23.q: the skew/map-side-agg FLAG matrix — the
-- flags pick plans, never answers; one battery pins the answers the
-- whole matrix must produce (multi-distinct + full agg set over one
-- grouped scan).
SELECT n_regionkey AS rk,
  COUNT(*) AS n, COUNT(DISTINCT n_name) AS dn,
  COUNT(DISTINCT SUBSTR(n_name, 1, 1)) AS dp,
  SUM(n_nationkey) AS s, ROUND(AVG(n_nationkey) * 100) / 100 AS a,
  MIN(n_name) AS mn, MAX(n_name) AS mx
FROM nation GROUP BY n_regionkey
