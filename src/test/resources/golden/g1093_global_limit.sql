-- reference: ql/src/test/queries/clientpositive/global_limit.q — the
-- limit-optimization shapes: CTAS-with-limit, ordered limits at
-- different sizes, and the "not qualified" forms (group+limit,
-- distinct+limit, aggregate+limit) that must bypass the shortcut.
set hive.limit.optimize.enable=true;
set hive.limit.row.max.size=100;
DROP TABLE IF EXISTS g1093_src;
DROP TABLE IF EXISTS g1093_tgt;
CREATE TABLE g1093_src USING parquet AS
  SELECT CAST(l_orderkey AS INT) AS key, l_returnflag AS value
  FROM lineitem WHERE l_orderkey < 300;
CREATE TABLE g1093_tgt AS SELECT key FROM g1093_src LIMIT 1;
SELECT 'one' AS tag, CAST(count(*) AS INT) AS v FROM g1093_tgt
UNION ALL
SELECT 'top30', CAST(count(*) AS INT) FROM
  (SELECT key FROM g1093_src ORDER BY key ASC LIMIT 30) a
UNION ALL
SELECT 'grouped5', CAST(count(*) AS INT) FROM
  (SELECT key, count(1) AS c FROM g1093_src GROUP BY key
   ORDER BY key ASC LIMIT 5) b
UNION ALL
SELECT 'distinct10', CAST(count(*) AS INT) FROM
  (SELECT DISTINCT key FROM g1093_src ORDER BY key ASC LIMIT 10) c
UNION ALL
SELECT 'agg1', CAST(count(*) AS INT) FROM
  (SELECT count(1) FROM g1093_src LIMIT 1) d
