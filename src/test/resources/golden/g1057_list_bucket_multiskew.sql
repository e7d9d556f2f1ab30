-- reference: ql/src/test/queries/clientpositive/list_bucket_dml_4.q +
-- list_bucket_query_multiskew_1.q — a table SKEWED BY TWO columns ON
-- several value pairs STORED AS DIRECTORIES; the skew layout must not
-- change filter results on skewed or non-skewed keys.
DROP TABLE IF EXISTS g1057_lb;
CREATE TABLE g1057_lb (key STRING, value STRING)
  PARTITIONED BY (ds STRING)
  SKEWED BY (key, value) ON (('4', 'NATION_4'), ('8', 'NATION_8'))
  STORED AS DIRECTORIES;
INSERT OVERWRITE TABLE g1057_lb PARTITION (ds='2008-04-08')
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
SELECT 'skewed' AS tag, key, value FROM g1057_lb WHERE ds='2008-04-08' AND key='4' AND value='NATION_4'
UNION ALL
SELECT 'plain', key, value FROM g1057_lb WHERE ds='2008-04-08' AND key='13'
UNION ALL
SELECT 'count', cast(count(1) AS STRING), '' FROM g1057_lb;
