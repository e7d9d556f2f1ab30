-- groupby_multi_insert_common_distinct.q: two branches sharing the SAME
-- distinct expression over different group keys
DROP TABLE IF EXISTS g403_a;
DROP TABLE IF EXISTS g403_b;
CREATE TABLE g403_a (k BIGINT, dc BIGINT) USING parquet;
CREATE TABLE g403_b (k BIGINT, dc BIGINT) USING parquet;
FROM customer
INSERT OVERWRITE TABLE g403_a
  SELECT c_nationkey, count(DISTINCT c_mktsegment) GROUP BY c_nationkey
INSERT OVERWRITE TABLE g403_b
  SELECT c_custkey % 3, count(DISTINCT c_mktsegment) GROUP BY c_custkey % 3;
SELECT 'nat' AS src, k, dc FROM g403_a
UNION ALL
SELECT 'mod' AS src, k, dc FROM g403_b;
