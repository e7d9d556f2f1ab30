-- udf battery stragglers: EXTRACT(unit FROM ts), version(), surrogate_key()
SELECT
  extract(year FROM o_orderdate) AS y,
  extract(month FROM o_orderdate) AS m,
  extract(day FROM o_orderdate) AS d,
  extract(dayofweek FROM o_orderdate) AS dw,
  CASE WHEN version() RLIKE '^[0-9]+\\.[0-9]+' THEN 1 ELSE 0 END AS has_version,
  count(DISTINCT sk) AS n_keys
FROM (SELECT o_orderdate, surrogate_key() AS sk FROM orders WHERE o_orderkey <= 32) t
GROUP BY 1, 2, 3, 4, 5
