-- limit_pushdown.q: multi-DISTINCT aggregate under an ordered limit
-- (Catalyst Expand rewrite + top-k).
SELECT l_returnflag, count(DISTINCT l_partkey) AS dp,
       count(DISTINCT l_suppkey) AS ds
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag LIMIT 20;
