SELECT v.code, v.descr, count(*) AS n
FROM orders o JOIN (VALUES ('O', 'open'), ('F', 'done'), ('P', 'pending')) AS v(code, descr)
  ON o.o_orderstatus = v.code
GROUP BY v.code, v.descr
