SELECT o_custkey % 10 AS bucket, count(DISTINCT o_orderstatus) AS ds, count(*) AS n
FROM orders GROUP BY o_custkey % 10
HAVING count(DISTINCT o_orderstatus) >= 2
