-- subquery_views.q: a view whose body holds a correlated EXISTS, then an
-- IN-subquery over the view itself (subquery-on-view-on-subquery).
CREATE OR REPLACE TEMPORARY VIEW g809_cv1 AS
SELECT * FROM nation b
WHERE EXISTS (SELECT a.n_nationkey FROM nation a
              WHERE b.n_regionkey = a.n_regionkey
                AND a.n_nationkey > 20);
SELECT n_nationkey, n_name FROM g809_cv1
WHERE g809_cv1.n_nationkey IN
  (SELECT n_nationkey FROM g809_cv1 c WHERE c.n_nationkey > 5)
