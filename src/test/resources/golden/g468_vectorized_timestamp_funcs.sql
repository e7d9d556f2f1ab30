-- vectorized_timestamp_funcs.q battery: to_unix_timestamp/from_unixtime/
-- year..second/date arithmetic over the events fixture's ts column
-- (TimestampType pinned, session UTC).
SELECT
  min(unix_timestamp(ts)) AS mn_epoch,
  max(unix_timestamp(ts)) AS mx_epoch,
  min(from_unixtime(unix_timestamp(ts))) AS mn_str,
  count(DISTINCT year(ts)) AS n_years,
  count(DISTINCT month(ts)) AS n_months,
  count(DISTINCT to_date(ts)) AS n_days,
  min(date_add(to_date(ts), 30)) AS mn_plus30,
  max(datediff(to_date(ts), '2020-01-01')) AS mx_dd,
  min(hour(ts)) AS mn_h, max(hour(ts)) AS mx_h,
  min(minute(ts)) AS mn_mi, max(second(ts)) AS mx_s
FROM events
