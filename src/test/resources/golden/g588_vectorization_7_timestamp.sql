-- vectorization_7.q timestamp expressions: cast-to-double epoch seconds,
-- extracts, and second-fraction handling.
SELECT CAST(CAST('2011-05-06 07:08:09.1234' AS TIMESTAMP) AS DOUBLE) AS ts_dbl,
       CAST(CAST('1969-12-31 23:59:59' AS TIMESTAMP) AS DOUBLE) AS neg_epoch,
       YEAR(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS y,
       MONTH(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS m,
       DAY(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS d,
       HOUR(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS h,
       MINUTE(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS mi,
       SECOND(CAST('2011-05-06 07:08:09' AS TIMESTAMP)) AS s,
       CAST(CAST(0.5 AS DOUBLE) AS TIMESTAMP) AS half_sec
