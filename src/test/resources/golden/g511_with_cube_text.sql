-- groupby_cube1.q: the WITH CUBE text form + grouping_id over both keys.
SELECT o_orderstatus AS st, o_orderpriority AS pri, count(1) AS n,
       grouping__id AS gid
FROM orders
WHERE o_orderkey <= 2000
GROUP BY o_orderstatus, o_orderpriority WITH CUBE
