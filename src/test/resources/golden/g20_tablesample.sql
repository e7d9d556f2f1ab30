SELECT count(*) AS n FROM lineitem WHERE l_orderkey % 11 = 5
