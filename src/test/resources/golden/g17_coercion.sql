SELECT o_orderkey FROM orders WHERE o_orderkey = '42' OR o_orderkey = 43.0
