-- reference: ql/src/test/queries/clientpositive/partition_boolexpr.q —
-- boolean constants and type-mismatched comparisons against partition
-- keys: unparseable comparands select nothing; TRUE/FALSE conjunctions
-- prune everything or nothing.
DROP TABLE IF EXISTS g1186_pb;
CREATE TABLE g1186_pb (key INT, value STRING)
  PARTITIONED BY (dt INT, ts STRING) STORED AS PARQUET;
INSERT INTO g1186_pb PARTITION (dt=11, ts='a')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 5;
SELECT
  (SELECT count(*) FROM g1186_pb WHERE key = 'abc') AS bad_key_cmp,
  (SELECT count(*) FROM g1186_pb WHERE dt = 'abc') AS bad_part_cmp,
  (SELECT count(1) FROM g1186_pb WHERE true) AS where_true,
  (SELECT count(1) FROM g1186_pb WHERE false) AS where_false,
  (SELECT count(1) FROM g1186_pb WHERE true AND ts='a') AS true_and,
  (SELECT count(1) FROM g1186_pb WHERE false OR ts='a') AS false_or,
  (SELECT count(1) FROM g1186_pb WHERE false AND ts='a') AS false_and
