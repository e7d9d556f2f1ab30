-- reference: ql/src/test/queries/clientpositive/udf_concat_insert1.q +
-- udf_concat_insert2.q — a CONSTANT select item beside a grouped
-- concat landed by INSERT (the constant is group-invariant).
DROP TABLE IF EXISTS g1199_dest;
CREATE TABLE g1199_dest (key INT, value STRING) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g1199_dest
  SELECT '1234', concat(n_name) WHERE n_nationkey < 5 GROUP BY n_name;
SELECT key, value FROM g1199_dest
