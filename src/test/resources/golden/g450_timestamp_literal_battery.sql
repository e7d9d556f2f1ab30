-- timestamp_1.q/timestamp_2.q/timestamp_comparison.q: timestamp literals,
-- casts to/from numeric epoch, comparison operators, and arithmetic via
-- unix_timestamp — session pinned UTC, TIMESTAMP reads as zoneless Hive 1.2.
SELECT
  CAST('2011-01-01 01:02:03' AS TIMESTAMP) AS t1,
  cast(CAST('2011-01-01 01:02:03.25' AS TIMESTAMP) AS DOUBLE) AS epoch_frac,
  cast(CAST(1293843723 AS TIMESTAMP) AS BIGINT) AS epoch_rt,
  CAST('2011-01-01 01:02:03' AS TIMESTAMP) = CAST('2011-01-01 01:02:03' AS TIMESTAMP) AS eq,
  CAST('2011-01-01 01:02:03' AS TIMESTAMP) < CAST('2011-01-01 01:02:04' AS TIMESTAMP) AS lt,
  year(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS y,
  month(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS m,
  day(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS d,
  hour(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS h,
  minute(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS mi,
  second(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS s,
  weekofyear(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS wk,
  to_date(CAST('2011-01-01 01:02:03' AS TIMESTAMP)) AS dt,
  datediff('2011-03-01', '2011-01-01') AS dd
