-- limit_pushdown.q: descending top-k.
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 20;
