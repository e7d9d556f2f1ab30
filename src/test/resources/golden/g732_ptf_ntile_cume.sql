-- vectorized_ptf.q-shape: ntile + cume_dist + percent_rank together.
SELECT p_brand, p_name,
  ntile(3) OVER (PARTITION BY p_brand ORDER BY p_name) AS nt,
  round(cume_dist() OVER (PARTITION BY p_brand ORDER BY p_name), 4) AS cd,
  round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_name), 4) AS pr
FROM part
WHERE p_partkey < 60;
