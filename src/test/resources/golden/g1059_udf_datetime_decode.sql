-- reference: ql/src/test/queries/clientpositive/udf5.q (from_unixtime /
-- to_date / day / month / year over date and timestamp strings,
-- unix_timestamp with a pattern) + udf_decode.q (decode() over binary
-- with string/varchar/char charset args and a NULL input) +
-- udf_to_unix_timestamp.q.
SELECT
  from_unixtime(1226446340) AS f1,
  to_date(from_unixtime(1226446340)) AS f2,
  day('2008-11-01') AS d1, month('2008-11-01') AS m1, year('2008-11-01') AS y1,
  day('2008-11-01 15:32:20') AS d2, month('2008-11-01 15:32:20') AS m2,
  year('2008-11-01 15:32:20') AS y2,
  from_unixtime(unix_timestamp('2010-01-13 11:57:40', 'yyyy-MM-dd HH:mm:ss'),
    'MM/dd/yy HH:mm:ss') AS p1,
  from_unixtime(to_unix_timestamp('2010-01-13 11:57:40')) AS p2,
  decode(binary('TestDecode1'), 'UTF-8') AS dc1,
  decode(binary('TestDecode2'), cast('UTF-8' AS VARCHAR(10))) AS dc2,
  decode(binary('TestDecode3'), cast('UTF-8' AS CHAR(5))) AS dc3,
  decode(cast(NULL AS BINARY), 'UTF-8') AS dc4;
