-- vectorized_date_funcs.q: date function battery over a date column —
-- weekofyear/dayofmonth/unix_date math/last_day/next_day/add_months.
SELECT o_orderkey, o_orderdate,
  WEEKOFYEAR(o_orderdate) AS woy,
  DAYOFMONTH(o_orderdate) AS dom,
  DATEDIFF('1998-01-01', o_orderdate) AS dd,
  LAST_DAY(o_orderdate) AS ld,
  NEXT_DAY(o_orderdate, 'MONDAY') AS nd,
  ADD_MONTHS(o_orderdate, 2) AS am,
  MONTHS_BETWEEN(DATE'1998-01-01', o_orderdate) AS mb
FROM orders WHERE o_orderkey < 6
