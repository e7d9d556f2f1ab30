-- udf battery (datetime, timezone-free probes only): clientpositive/
-- udf_day.q, udf_dayofmonth.q, udf_month.q, udf_year.q, udf_hour.q,
-- udf_minute.q, udf_second.q, udf_weekofyear.q, udf_datediff.q,
-- udf_date_add.q, udf_date_sub.q, udf_to_date.q, udf_last_day.q,
-- udf_add_months.q, udf_months_between.q, udf_next_day.q, udf_trunc.q,
-- udf_quarter.q (epoch-based from_unixtime/unix_timestamp probes are
-- session-timezone-dependent and stay out of the pinned set).
SELECT
  day('2009-07-30') AS d1, dayofmonth('2009-07-30') AS d2,
  month('2009-07-30') AS m1, year('2009-07-30') AS y1,
  hour('2009-07-30 12:58:59') AS h1,
  minute('2009-07-30 12:58:59') AS mi1,
  second('2009-07-30 12:58:59') AS s1,
  weekofyear('1980-01-01') AS w1, weekofyear('1980-01-06') AS w2,
  datediff('2009-07-30', '2009-07-29') AS dd1,
  datediff('2009-07-29', '2009-07-30') AS dd2,
  date_add('2009-07-30', 1) AS da1, date_sub('2009-07-30', 1) AS ds1,
  to_date('2009-07-30 04:17:52') AS td1,
  last_day('2015-02-05') AS ld1, last_day('2016-02-05') AS ld2,
  add_months('2009-08-31', 1) AS am1, add_months('2009-08-31', -1) AS am2,
  round(months_between('1997-02-28 10:30:00', '1996-10-30'), 6) AS mb1,
  next_day('2015-07-01', 'FR') AS nd1,
  trunc('2015-03-17', 'MM') AS tc1, trunc('2015-03-17', 'YEAR') AS tc2,
  quarter('2015-04-08') AS q1
