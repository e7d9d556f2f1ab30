-- avro_timestamp.q: TIMESTAMP values — scalar, map value, array element
-- — through a partitioned STORED AS AVRO table (timestamp logical
-- type), grouped count and range predicates over string literals.
DROP TABLE IF EXISTS g964_avro_ts;
CREATE TABLE g964_avro_ts
  (d TIMESTAMP, m1 MAP<STRING, TIMESTAMP>, l1 ARRAY<TIMESTAMP>)
  PARTITIONED BY (p1 INT) STORED AS AVRO;
INSERT OVERWRITE TABLE g964_avro_ts PARTITION (p1=2)
  SELECT * FROM (
    SELECT CAST('2012-02-21 07:08:09.123' AS TIMESTAMP) AS d,
           map('foo', CAST('1980-12-16 07:08:09.123' AS TIMESTAMP)) AS m1,
           array(CAST('2011-09-04 07:08:09.123' AS TIMESTAMP)) AS l1
    UNION ALL
    SELECT CAST('2014-02-11 07:08:09.123' AS TIMESTAMP),
           map('baz', CAST('1981-12-16 07:08:09.123' AS TIMESTAMP)),
           array(CAST('2011-09-05 07:08:09.123' AS TIMESTAMP))
    UNION ALL
    SELECT CAST('1947-02-11 07:08:09.123' AS TIMESTAMP),
           map('baz', CAST('1921-12-16 07:08:09.123' AS TIMESTAMP)),
           array(CAST('2011-09-05 07:08:09.123' AS TIMESTAMP))
  ) v;
SELECT 'all' AS probe, CAST(d AS STRING) AS ds, CAST(m1 AS STRING) AS m1s,
       CAST(l1 AS STRING) AS l1s, p1, CAST(NULL AS BIGINT) AS cnt
  FROM g964_avro_ts
UNION ALL
SELECT 'grp' AS probe, CAST(d AS STRING), NULL, NULL, NULL, COUNT(d)
  FROM g964_avro_ts GROUP BY d
UNION ALL
SELECT 'ne' AS probe, CAST(d AS STRING), NULL, NULL, NULL, NULL
  FROM g964_avro_ts WHERE d != '1947-02-11 07:08:09.123'
UNION ALL
SELECT 'lt' AS probe, CAST(d AS STRING), NULL, NULL, NULL, NULL
  FROM g964_avro_ts WHERE d < '2014-12-21 07:08:09.123'
UNION ALL
SELECT 'gt' AS probe, CAST(d AS STRING), NULL, NULL, NULL, NULL
  FROM g964_avro_ts WHERE d > '8000-12-01 07:08:09.123'
