-- date_format pattern breadth
SELECT o_orderdate,
  date_format(o_orderdate, 'EEEE') AS dow_name,
  date_format(o_orderdate, 'Q') AS qtr,
  date_format(o_orderdate, 'DDD') AS doy,
  date_format(o_orderdate, 'yyyy-MM') AS ym,
  date_format(o_orderdate, 'MMM dd, yyyy') AS pretty,
  quarter(o_orderdate) AS q_fn, dayofyear(o_orderdate) AS doy_fn
FROM orders WHERE o_orderkey <= 30
