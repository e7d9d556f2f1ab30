-- timestamp_3.q, timestamp_lazy.q, timestamp_udf.q: timestamp function
-- battery — unix_timestamp round trip, to/from_unixtime, second
-- fractions through CAST, weekday/datediff over timestamps.
SELECT FROM_UNIXTIME(0) AS epoch0,
  TO_UNIX_TIMESTAMP(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS tts,
  FROM_UNIXTIME(TO_UNIX_TIMESTAMP(CAST('2011-05-06 07:08:09' AS TIMESTAMP))) AS rt,
  CAST(CAST('2011-05-06 07:08:09.5' AS TIMESTAMP) AS DOUBLE) AS frac,
  DATEDIFF(CAST('2011-05-06' AS DATE), CAST('2011-04-06' AS DATE)) AS dd,
  DAYOFWEEK(CAST('2011-05-06 00:00:00' AS TIMESTAMP)) AS dow,
  UNIX_TIMESTAMP('2011-05-06 07:08:09', 'yyyy-MM-dd HH:mm:ss') AS parsed
