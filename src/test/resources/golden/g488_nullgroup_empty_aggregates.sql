-- nullgroup.q / nullgroup2.q: aggregates over a filter that matches no
-- rows — global aggregation answers ONE row (count 0, sum NULL); grouped
-- aggregation answers ZERO rows.
SELECT 'global' AS tag, cast(count(1) AS STRING) AS c, cast(sum(n_nationkey) AS STRING) AS s
FROM nation WHERE n_nationkey > 9999
UNION ALL
SELECT 'grouped', cast(count(1) AS STRING), NULL
FROM nation WHERE n_nationkey > 9999 GROUP BY n_regionkey
UNION ALL
SELECT 'global_distinct', cast(count(DISTINCT n_regionkey) AS STRING), NULL
FROM nation WHERE n_nationkey > 9999
