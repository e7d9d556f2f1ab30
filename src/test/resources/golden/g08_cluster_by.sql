SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey < 40
DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber
