-- create_view.q / ctas_colname.q: unaliased expression columns in a
-- VIEW also take Hive's positional names (_cN) — renamed in place via
-- the view column list, since a view cannot re-land through a temp view.
DROP VIEW IF EXISTS g330_v;
CREATE TEMPORARY VIEW g330_v AS
SELECT n_regionkey, count(1), max(n_name)
FROM nation GROUP BY n_regionkey;
SELECT n_regionkey, _c1, _c2 FROM g330_v ORDER BY n_regionkey;
