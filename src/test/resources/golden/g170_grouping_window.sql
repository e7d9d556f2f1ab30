-- groupby_grouping_window.q: window over a grouping-sets aggregate
SELECT st, gid, n, max(n) OVER (PARTITION BY gid) AS max_n FROM (
  SELECT o_orderstatus AS st, grouping(o_orderstatus) AS gid, count(*) AS n
  FROM orders GROUP BY o_orderstatus GROUPING SETS ((o_orderstatus), ())
) t
