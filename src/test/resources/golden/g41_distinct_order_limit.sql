SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3
