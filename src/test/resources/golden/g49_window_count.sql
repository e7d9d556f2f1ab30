SELECT s_suppkey, count(*) OVER (PARTITION BY s_nationkey) AS peers
FROM supplier
