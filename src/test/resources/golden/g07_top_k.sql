SELECT o_orderkey, o_custkey FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
