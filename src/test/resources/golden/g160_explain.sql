EXPLAIN SELECT l_returnflag, sum(l_quantity) AS q FROM lineitem WHERE l_shipdate < '1995-01-01' GROUP BY l_returnflag
