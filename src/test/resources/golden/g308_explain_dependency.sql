-- explain_dependency.q: EXPLAIN DEPENDENCY lists the input tables a
-- query reads (ExplainTask.getJSONDependencies) — views expand, so both
-- the view and its base table appear; outer aliases (n2) do not.
DROP VIEW IF EXISTS g308_v;
CREATE TEMPORARY VIEW g308_v AS
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
EXPLAIN DEPENDENCY
  SELECT v.n_name, r.r_name, n2.n_regionkey
  FROM g308_v v
  JOIN nation n2 ON v.n_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey;
