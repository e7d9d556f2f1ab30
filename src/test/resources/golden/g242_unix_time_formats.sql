-- unix_timestamp/from_unixtime with explicit patterns, to_unix_timestamp
SELECT from_unixtime(0) AS epoch0,
  from_unixtime(86400 * 365, 'yyyy/MM/dd') AS y1971,
  unix_timestamp('1995-06-15 12:30:00') AS ut,
  unix_timestamp('15/06/1995', 'dd/MM/yyyy') AS ut_fmt,
  to_unix_timestamp('1995-06-15', 'yyyy-MM-dd') AS tut,
  from_unixtime(unix_timestamp('1995-06-15 12:30:00')) AS rt
FROM region WHERE r_regionkey = 0
