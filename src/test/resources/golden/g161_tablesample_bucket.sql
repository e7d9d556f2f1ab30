SELECT l_returnflag, count(*) AS n FROM lineitem TABLESAMPLE(BUCKET 2 OUT OF 5 ON l_orderkey) GROUP BY l_returnflag
