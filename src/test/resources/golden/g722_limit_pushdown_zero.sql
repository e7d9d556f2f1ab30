-- limit_pushdown.q: LIMIT 0 short-circuits to an empty result with the
-- right schema.
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 0;
