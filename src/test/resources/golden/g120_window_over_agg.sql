SELECT o_orderstatus, tot,
  rank() OVER (ORDER BY tot DESC) AS rk,
  round(tot / sum(tot) OVER (), 6) AS share
FROM (SELECT o_orderstatus, sum(o_totalprice) AS tot FROM orders GROUP BY o_orderstatus) t
