SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM') AS ym,
  date_format(o_orderdate, 'EEEE') AS dow,
  from_unixtime(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)), 'yyyy/MM/dd') AS rt,
  datediff(date'1998-01-01', o_orderdate) AS dd,
  date_add(o_orderdate, 45) AS da, date_sub(o_orderdate, 45) AS ds
FROM orders WHERE o_orderkey <= 25
