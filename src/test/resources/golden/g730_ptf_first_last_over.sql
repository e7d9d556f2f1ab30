-- ptf.q: first_value / last_value over ordered partitions.
SELECT p_brand, p_name,
  first_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_name) AS fv,
  last_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_name
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
FROM part
WHERE p_partkey < 60;
