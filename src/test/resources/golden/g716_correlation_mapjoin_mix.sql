-- correlationoptimizer1.q (auto.convert.join=true leg): with the map-join
-- conversion on, the correlation rewrite must stand down — results are
-- identical either way; the broadcast bridge conf drives the plan here.
set hive.auto.convert.join=true;
set hive.optimize.correlation=true;
SELECT SUM(HASH(tmp.nk)) AS hk, SUM(HASH(tmp.cnt)) AS hc
FROM (SELECT s.s_nationkey AS nk, count(1) AS cnt
      FROM supplier s JOIN nation n ON (s.s_nationkey = n.n_nationkey)
      GROUP BY s.s_nationkey) tmp;
