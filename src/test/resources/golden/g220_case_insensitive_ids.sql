-- identifier case-insensitivity: mixed-case table/column/alias references
SELECT O_OrderStatus AS St, COUNT(*) AS N
FROM ORDERS WHERE o_ORDERKEY <= 1000 GROUP BY o_orderstatus
