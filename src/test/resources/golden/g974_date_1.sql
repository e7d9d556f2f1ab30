-- date_1.q: DATE values through cast-from-string, the DATE literal
-- keyword, and cast-from-timestamp all store the same day; valid cast
-- matrix and the unix_timestamp equality battery ("these comparisons
-- should all be true").
DROP TABLE IF EXISTS g974_date1;
CREATE TABLE g974_date1 (d DATE) USING parquet;
INSERT OVERWRITE TABLE g974_date1
  SELECT cast('2011-01-01' AS date) FROM nation LIMIT 1;
INSERT INTO g974_date1
  SELECT date '2011-01-01' FROM nation LIMIT 1;
INSERT INTO g974_date1
  SELECT cast(cast('2011-01-01 00:00:00' AS timestamp) AS date)
  FROM nation LIMIT 1;
SELECT d, count(d) AS cnt,
       cast(d AS string) AS ds,
       cast(cast(d AS timestamp) AS string) AS dts,
       cast(cast(d AS timestamp) AS date) AS dtd,
       (date '2011-01-01' = date '2011-01-01') AS c1,
       (unix_timestamp(date '2011-01-01')
          = unix_timestamp(cast(date '2011-01-01' AS timestamp))) AS c2,
       (unix_timestamp(date '2011-01-01')
          < unix_timestamp(cast('2011-01-01 00:00:01' AS timestamp))) AS c3,
       (unix_timestamp(date '2011-01-01')
          > unix_timestamp(cast('2010-12-31 23:59:59' AS timestamp))) AS c4,
       (date '2011-01-01' = cast(cast('2011-01-01 23:24:25' AS timestamp) AS date)) AS c5,
       ('2011-01-01' = cast(d AS string)) AS c6
FROM g974_date1 GROUP BY d
