-- groupby2_map_multi_distinct.q: two DISTINCT aggregates with different
-- arguments beside plain aggregates in one GROUP BY over a substring key,
-- staged through INSERT OVERWRITE like the reference.
DROP TABLE IF EXISTS g800_dest;
CREATE TABLE g800_dest (key STRING, c1 BIGINT, c2 STRING, c3 BIGINT, c4 BIGINT)
  USING parquet;
FROM orders
INSERT OVERWRITE TABLE g800_dest
SELECT substr(o_orderpriority, 1, 1),
       count(DISTINCT o_orderstatus),
       concat(substr(o_orderpriority, 1, 1), sum(o_custkey)),
       sum(DISTINCT o_custkey % 7),
       count(o_orderdate)
GROUP BY substr(o_orderpriority, 1, 1);
SELECT * FROM g800_dest
