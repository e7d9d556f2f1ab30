-- reference: ql/src/test/queries/clientpositive/udf_to_unix_timestamp.q
-- — to_unix_timestamp with default format, explicit patterns, an
-- am/pm pattern, and an unparseable string (NULL).
SELECT
  to_unix_timestamp('2009-03-20 11:30:01') AS t1,
  to_unix_timestamp('2009-03-20', 'yyyy-MM-dd') AS t2,
  to_unix_timestamp('2009 Mar 20 11:30:01 am', 'yyyy MMM dd h:mm:ss a') AS t3,
  to_unix_timestamp('random_string') AS t4,
  from_unixtime(to_unix_timestamp('2009-03-20 11:30:01')) AS round_trip
FROM nation TABLESAMPLE (1 ROWS)
