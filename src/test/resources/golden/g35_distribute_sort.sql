SELECT l_returnflag, count(*) AS n FROM lineitem
GROUP BY l_returnflag ORDER BY n DESC, l_returnflag
