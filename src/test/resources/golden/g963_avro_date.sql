-- avro_date.q: DATE values — scalar, map value, array element — through
-- a partitioned STORED AS AVRO table (date-logical-type int encoding),
-- with the stem's grouped count and range predicates.
DROP TABLE IF EXISTS g963_avro_date;
CREATE TABLE g963_avro_date (d DATE, m1 MAP<STRING, DATE>, l1 ARRAY<DATE>)
  PARTITIONED BY (p1 INT, p2 DATE) STORED AS AVRO;
INSERT OVERWRITE TABLE g963_avro_date PARTITION (p1=2, p2='2014-09-26')
  SELECT * FROM (
    SELECT CAST('2012-02-21' AS DATE) AS d,
           map('foo', CAST('1980-12-16' AS DATE),
               'bar', CAST('1998-05-07' AS DATE)) AS m1,
           array(CAST('2011-09-04' AS DATE), CAST('2011-09-05' AS DATE)) AS l1
    UNION ALL
    SELECT CAST('2014-02-11' AS DATE),
           map('baz', CAST('1981-12-16' AS DATE)),
           array(CAST('2011-09-05' AS DATE))
    UNION ALL
    SELECT CAST('1947-02-11' AS DATE),
           map('baz', CAST('1921-12-16' AS DATE)),
           array(CAST('2011-09-05' AS DATE))
  ) v;
SELECT 'all' AS probe, d, CAST(m1 AS STRING) AS m1s, CAST(l1 AS STRING) AS l1s,
       p1, CAST(p2 AS STRING) AS p2s, CAST(NULL AS BIGINT) AS cnt
  FROM g963_avro_date
UNION ALL
SELECT 'grp' AS probe, d, NULL, NULL, NULL, NULL, COUNT(d)
  FROM g963_avro_date GROUP BY d
UNION ALL
SELECT 'ne' AS probe, d, NULL, NULL, NULL, NULL, NULL
  FROM g963_avro_date WHERE d != '1947-02-11'
UNION ALL
SELECT 'lt' AS probe, d, NULL, NULL, NULL, NULL, NULL
  FROM g963_avro_date WHERE d < '2014-12-21'
UNION ALL
SELECT 'gt' AS probe, d, NULL, NULL, NULL, NULL, NULL
  FROM g963_avro_date WHERE d > '8000-12-01'
