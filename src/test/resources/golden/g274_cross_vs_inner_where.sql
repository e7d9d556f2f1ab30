-- CROSS JOIN + WHERE must equal INNER JOIN ON (result parity pin)
SELECT 'cross' AS how, count(*) AS n FROM nation a CROSS JOIN region b WHERE a.n_regionkey = b.r_regionkey
UNION ALL
SELECT 'inner' AS how, count(*) AS n FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey
