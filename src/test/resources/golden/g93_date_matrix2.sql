SELECT o_orderkey, add_months(o_orderdate, 2) AS am, last_day(o_orderdate) AS ld,
  next_day(o_orderdate, 'MON') AS nd, trunc(o_orderdate, 'MM') AS tm,
  round(months_between(date'1998-01-01', o_orderdate), 4) AS mb,
  weekofyear(o_orderdate) AS wy, dayofweek(o_orderdate) AS dw, quarter(o_orderdate) AS q
FROM orders WHERE o_orderkey <= 30
