-- reference: ql/src/test/queries/clientpositive/cbo_simple_select.q (+
-- cbo_limit.q shapes) — the CBO-on select/filter/derived-table battery:
-- aliased scans, compound predicates with float/int arithmetic, nested
-- derived tables repeating the filter, and a limit. On this engine
-- hive.cbo.enable maps to Catalyst/AQE, which is always the planner.
set hive.cbo.enable=true;
set hive.exec.check.crossproducts=false;
DROP TABLE IF EXISTS g1089_t1;
CREATE TABLE g1089_t1 USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key,
         CAST(n_nationkey % 7 - 3 AS INT) AS c_int,
         CAST(n_regionkey AS FLOAT) + 0.5 AS c_float
  FROM nation;
SELECT x, c_int, y FROM (
  SELECT t2.key AS x, c_int, (((c_int + c_float) * 10) + 5) AS y
  FROM g1089_t1 AS t2
  WHERE t2.c_int >= 0 AND c_float + c_int >= 0 OR c_float <= 100
) t1
WHERE t1.c_int >= 0 AND y + c_int >= 0 OR x <= '100'
ORDER BY x, y
LIMIT 10
