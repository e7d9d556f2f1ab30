SELECT l_returnflag, count(DISTINCT l_partkey) AS ndp, count(DISTINCT l_suppkey) AS nds
FROM lineitem GROUP BY l_returnflag
