-- null_column.q: untyped NULL projections written through INSERT
-- OVERWRITE into typed columns, plus a partitioned insert whose VALUE
-- column is NULL while the partition key is not.
DROP TABLE IF EXISTS g812_tt;
DROP TABLE IF EXISTS g812_part;
CREATE TABLE g812_tt (a INT, b STRING) USING parquet;
INSERT OVERWRITE TABLE g812_tt SELECT NULL, NULL FROM nation LIMIT 3;
CREATE TABLE g812_part (key STRING, value STRING)
  USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g812_part PARTITION (ds='2010-04-01')
SELECT '1', NULL FROM nation LIMIT 1;
SELECT t.a, t.b, p.key, p.value, p.ds
FROM g812_tt t CROSS JOIN g812_part p
WHERE p.ds IS NOT NULL
