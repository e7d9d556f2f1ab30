-- groupby_multi_single_reducer.q: one FROM source fanning into branches
-- with per-branch WHERE + count(DISTINCT) + sum(DISTINCT) + plain aggs
DROP TABLE IF EXISTS g401_a;
DROP TABLE IF EXISTS g401_b;
CREATE TABLE g401_a (st STRING, dc BIGINT, sd DOUBLE, c BIGINT) USING parquet;
CREATE TABLE g401_b (st STRING, dc BIGINT, sd DOUBLE, c BIGINT) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g401_a
  SELECT o_orderstatus, count(DISTINCT o_custkey),
         round(sum(DISTINCT o_totalprice) * 100) / 100, count(o_orderkey)
  WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus
INSERT OVERWRITE TABLE g401_b
  SELECT o_orderstatus, count(DISTINCT o_custkey),
         round(sum(DISTINCT o_totalprice) * 100) / 100, count(o_orderkey)
  WHERE o_orderkey % 2 = 1 GROUP BY o_orderstatus;
SELECT 'even' AS half, st, dc, sd, c FROM g401_a
UNION ALL
SELECT 'odd' AS half, st, dc, sd, c FROM g401_b;
