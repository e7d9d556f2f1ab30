-- clientpositive/limit_pushdown.q: ORDER BY + LIMIT becomes a top-k
-- (TakeOrderedAndProject — the map-side limit HIVE-3562 pushes down).
set hive.limit.pushdown.memory.usage=0.3;
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20;
