-- cross_product_check_1.q/2.q: explicit CROSS JOIN, comma-list implicit
-- cross with WHERE, and a cross of an aggregate subquery.
SELECT 'explicit' AS tag, a.r_regionkey AS ak, b.r_regionkey AS bk
FROM region a CROSS JOIN region b
UNION ALL
SELECT 'comma_where', a.r_regionkey, b.r_regionkey
FROM region a, region b
WHERE a.r_regionkey + b.r_regionkey = 4
UNION ALL
SELECT 'agg_cross', a.r_regionkey, cast(t.c AS INT)
FROM region a CROSS JOIN (SELECT count(1) AS c FROM nation) t
