-- leadlag.q: lag() with a DEFAULT argument over the noop PTF, the same
-- spec over the bare table, and the DISTRIBUTE BY/SORT BY window
-- spelling — all three must agree on the delta column.
SELECT p_brand, p_name, p_size,
       p_size - lag(p_size, 1, p_size)
         OVER (PARTITION BY p_brand ORDER BY p_name) AS delta_noop
FROM noop(ON part PARTITION BY p_brand ORDER BY p_name)
WHERE p_partkey <= 60
UNION ALL
SELECT p_brand, p_name, p_size,
       p_size - lag(p_size, 1, p_size)
         OVER (DISTRIBUTE BY p_brand SORT BY p_name) AS delta_noop
FROM part
WHERE p_partkey <= 60
