-- reference: ql/src/test/queries/clientpositive/filter_numeric.q — an
-- INT partition key under every range shape: <, <= with >, BETWEEN,
-- NOT BETWEEN (partition pruning on a numeric key, not a string one).
set hive.exec.dynamic.partition=true;
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g1094_partint;
CREATE TABLE g1094_partint (key STRING)
  PARTITIONED BY (ds STRING, hr INT) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1094_partint PARTITION (ds, hr)
  SELECT n_name, '2008-04-08', CAST(11 + n_nationkey % 3 AS INT)
  FROM nation;
SELECT
  (SELECT count(*) FROM g1094_partint WHERE hr < 11) AS lt11,
  (SELECT count(*) FROM g1094_partint WHERE hr <= 12 AND hr > 11) AS h12,
  (SELECT count(*) FROM g1094_partint WHERE hr BETWEEN 11 AND 12) AS btw,
  (SELECT count(*) FROM g1094_partint WHERE hr NOT BETWEEN 12 AND 14) AS nbtw,
  (SELECT count(*) FROM g1094_partint WHERE hr < 13) AS lt13
