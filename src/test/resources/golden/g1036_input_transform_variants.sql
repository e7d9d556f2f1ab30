-- reference: ql/src/test/queries/clientpositive/input33.q (MAP ... USING
-- then REDUCE ... USING over the distributed/sorted intermediate),
-- input34.q (TRANSFORM with explicit ROW FORMAT SERDE on both sides),
-- input36.q (TRANSFORM with non-default \002/\003 field delimiters),
-- input38.q (TRANSFORM over expressions with the default (key, value)
-- output names).
DROP TABLE IF EXISTS g1036_d1;
CREATE TABLE g1036_d1 (key INT, value STRING) USING parquet;
FROM (
  FROM nation
  MAP nation.n_nationkey, nation.n_name
  USING 'cat'
  DISTRIBUTE BY key
  SORT BY key, value
) tmap
INSERT OVERWRITE TABLE g1036_d1
REDUCE tmap.key, tmap.value
USING 'cat'
AS (key STRING, value STRING);
SELECT 'mapreduce' AS tag, count(*) AS n, sum(key) AS s FROM g1036_d1
UNION ALL
SELECT 'delims', count(*), sum(cast(tkey AS INT)) FROM (
  FROM nation
  SELECT TRANSFORM(nation.n_nationkey, nation.n_name) ROW FORMAT DELIMITED FIELDS TERMINATED BY '\002'
  USING 'cat'
  AS (tkey, tvalue) ROW FORMAT DELIMITED FIELDS TERMINATED BY '\002'
) t2
UNION ALL
SELECT 'exprs', count(*), sum(cast(key AS INT) + cast(value AS INT)) FROM (
  FROM nation
  SELECT TRANSFORM(nation.n_nationkey, nation.n_nationkey + 1, 1+2, 3+4)
  USING 'cat'
) t3;
