-- empty OVER () spec battery: grand-total window over GROUP BY output
SELECT n_name, count(*) AS n,
  sum(count(*)) over () AS total_rows,
  count(*) over () AS n_groups,
  round(count(*) * 100.0 / sum(count(*)) over ()) AS pct
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
