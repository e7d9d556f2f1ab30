-- aggregates over zero rows: count=0, sum/max/avg=NULL (global agg only)
SELECT count(*) AS n, sum(o_totalprice) AS s, max(o_orderstatus) AS m, avg(o_totalprice) AS a
FROM orders WHERE o_orderkey < 0
