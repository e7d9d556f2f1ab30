-- ORDER BY an expression/column absent from the SELECT list
SELECT o_orderstatus, o_orderkey FROM orders
WHERE o_orderkey <= 100 ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
