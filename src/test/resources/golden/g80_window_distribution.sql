SELECT o_orderkey, ntile(4) OVER w AS nt, dense_rank() OVER w AS dr,
  round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd
FROM orders WHERE o_orderkey <= 60
WINDOW w AS (ORDER BY o_totalprice)
