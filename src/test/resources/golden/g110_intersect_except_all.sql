WITH a AS (SELECT o_orderstatus AS s FROM orders WHERE o_orderkey <= 40),
     b AS (SELECT o_orderstatus AS s FROM orders WHERE o_orderkey BETWEEN 20 AND 60)
SELECT 'ia' AS op, s, count(*) AS n FROM (SELECT s FROM a INTERSECT ALL SELECT s FROM b) t GROUP BY s
UNION ALL
SELECT 'ea' AS op, s, count(*) AS n FROM (SELECT s FROM a EXCEPT ALL SELECT s FROM b) t GROUP BY s
