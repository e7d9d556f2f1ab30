SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
HAVING count(*) > (SELECT avg(cnt) FROM
  (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) s)
