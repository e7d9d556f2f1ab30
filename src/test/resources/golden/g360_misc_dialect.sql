-- dialect odds and ends: duplicate GROUP BY keys (groupby_sort_1.q),
-- multi-column IN over a subquery, LIMIT 0 as an empty relation
SELECT 'dup_gby' AS tag, n_regionkey AS k, count(*) AS c
FROM nation GROUP BY n_regionkey, n_regionkey
UNION ALL
SELECT 'multicol_in', n_nationkey, 1
FROM nation WHERE (n_nationkey, n_regionkey) IN (SELECT r_regionkey, r_regionkey FROM region)
UNION ALL
SELECT 'limit0', n_nationkey, 1 FROM (SELECT * FROM nation LIMIT 0) z
