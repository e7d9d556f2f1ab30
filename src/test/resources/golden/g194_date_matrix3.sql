-- date_udf.q breadth: week/day/last_day/add_months/months_between/trunc/next_day
SELECT o_orderdate,
  weekofyear(o_orderdate) AS wk, dayofweek(o_orderdate) AS dw,
  last_day(o_orderdate) AS ld, add_months(o_orderdate, 2) AS am,
  round(months_between('1998-01-01', o_orderdate) * 100) / 100 AS mb,
  trunc(o_orderdate, 'MM') AS tm, next_day(o_orderdate, 'MONDAY') AS nd
FROM orders WHERE o_orderkey <= 40
