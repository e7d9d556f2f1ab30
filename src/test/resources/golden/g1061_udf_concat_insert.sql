-- reference: ql/src/test/queries/clientpositive/udf_concat_insert1.q +
-- udf_concat_insert2.q — concat over constants and over columns feeding
-- FROM-first inserts (the classic constant-first destination shape).
DROP TABLE IF EXISTS g1061_dest1;
DROP TABLE IF EXISTS g1061_dest2;
CREATE TABLE g1061_dest1 (key INT, value STRING) USING parquet;
CREATE TABLE g1061_dest2 (key STRING, value STRING) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g1061_dest1 SELECT '1234', concat(nation.n_name) WHERE n_nationkey < 5;
FROM nation
INSERT OVERWRITE TABLE g1061_dest2
  SELECT concat('1234', 'abc', 'extra argument'), nation.n_name WHERE n_nationkey < 5;
SELECT 'd1' AS tag, cast(key AS STRING) AS k, value FROM g1061_dest1
UNION ALL
SELECT 'd2', key, value FROM g1061_dest2;
