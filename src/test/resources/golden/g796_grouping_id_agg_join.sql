-- groupby_grouping_id2.q: GROUPING__ID consumed by an OUTER aggregate
-- (count per grouping-set id) and as a JOIN key between two rollups.
SELECT t1.gid AS gid1, t2.gid AS gid2, count(*) AS n FROM
  (SELECT GROUPING__ID AS gid FROM nation
   GROUP BY n_regionkey, n_nationkey % 2 WITH ROLLUP) t1
JOIN
  (SELECT GROUPING__ID AS gid FROM nation
   GROUP BY n_regionkey, n_nationkey % 2 WITH ROLLUP) t2
ON t1.gid = t2.gid
GROUP BY t1.gid, t2.gid
