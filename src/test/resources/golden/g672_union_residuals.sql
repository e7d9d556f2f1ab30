-- union.q, union7.q, union8.q, union9.q, union10.q, union14.q,
-- union15.q, union16.q, union18.q, union_view.q: a three-branch
-- self-union, union feeding a COUNT(DISTINCT), a VIEW over a union
-- queried with a filter, and a union of a map-only branch with an
-- aggregate branch.
CREATE OR REPLACE TEMPORARY VIEW g672_v AS
  SELECT n_nationkey AS k, 'n' AS src FROM nation
  UNION ALL
  SELECT r_regionkey, 'r' FROM region;
SELECT 'three_branch' AS tag, COUNT(*) AS n FROM
  (SELECT n_name FROM nation UNION ALL SELECT n_name FROM nation
   UNION ALL SELECT n_name FROM nation) u
UNION ALL
SELECT 'distinct_over_union', COUNT(DISTINCT k) FROM g672_v
UNION ALL
SELECT 'view_filtered', COUNT(*) FROM g672_v WHERE k < 5
UNION ALL
SELECT 'map_plus_agg', COUNT(*) FROM
  (SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
   UNION ALL
   SELECT COUNT(*) FROM nation) m
