-- limit_pushdown.q: ordering by the AGGREGATE output (the 2MR shape —
-- the limit applies to the last shuffle, not the group shuffle).
SELECT o_orderpriority, sum(o_totalprice) AS s
FROM orders GROUP BY o_orderpriority ORDER BY s LIMIT 5;
