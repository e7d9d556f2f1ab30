SELECT * FROM
  (SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders)
PIVOT (count(*) AS n, sum(o_totalprice) AS tot
       FOR o_orderstatus IN ('O' AS open, 'F' AS done, 'P' AS pend))
