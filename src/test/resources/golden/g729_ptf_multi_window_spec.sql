-- ptf.q: DISTINCT window specs in one select — one sorted by name, one
-- framed by rows.
SELECT p_brand, p_name, p_size,
  round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s1,
  round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) AS s2
FROM part
WHERE p_partkey < 60;
