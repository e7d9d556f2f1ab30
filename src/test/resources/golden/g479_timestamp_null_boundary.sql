-- timestamp_null.q + boundary literals: NULL timestamps through
-- functions, and pre-epoch / far-future literals round-tripping.
SELECT
  CAST(NULL AS TIMESTAMP) AS t_null,
  year(CAST(NULL AS TIMESTAMP)) AS y_null,
  unix_timestamp(CAST(NULL AS TIMESTAMP)) AS epoch_null,
  CAST('1400-02-01 00:00:00' AS TIMESTAMP) AS t_pre_gregorian,
  CAST('9999-12-31 23:59:59' AS TIMESTAMP) AS t_max,
  cast(CAST('1969-12-31 23:59:59' AS TIMESTAMP) AS BIGINT) AS pre_epoch_secs,
  CAST('2011-01-01' AS TIMESTAMP) AS t_date_only,
  coalesce(CAST(NULL AS TIMESTAMP), CAST('2001-01-01 00:00:00' AS TIMESTAMP)) AS t_coalesce
