-- limit_pushdown.q: aggregate then ordered limit (the deduped-RS shape).
SELECT o_orderpriority, sum(o_totalprice + 1) AS s
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 20;
