-- correlated scalar subquery in the SELECT list
SELECT p_partkey, p_size,
  (SELECT round(avg(p2.p_size) * 100) / 100 FROM part p2 WHERE p2.p_brand = p.p_brand) AS mfgr_avg
FROM part p WHERE p_partkey <= 50
