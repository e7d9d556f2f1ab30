-- lateral_view_ppd.q shapes (incl. HIVE-4293): predicate directly after a
-- LATERAL VIEW inside a subquery, plus an outer base-column predicate that
-- must push below the generate
SELECT n_name, mycol, mycol2 FROM (
  SELECT * FROM nation
  LATERAL VIEW explode(array(1, 2, 3)) t1 AS mycol
  LATERAL VIEW explode(array(10, 20)) t2 AS mycol2
  WHERE mycol > 1) a
WHERE n_regionkey = 0
