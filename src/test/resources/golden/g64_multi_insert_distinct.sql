DROP TABLE IF EXISTS g64_a;
DROP TABLE IF EXISTS g64_b;
CREATE TABLE g64_a (k BIGINT, nd BIGINT) USING parquet;
CREATE TABLE g64_b (k STRING, nd BIGINT) USING parquet;
FROM (SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderkey < 400) s
INSERT OVERWRITE TABLE g64_a SELECT o_custkey, count(DISTINCT o_orderstatus) GROUP BY o_custkey
INSERT OVERWRITE TABLE g64_b SELECT o_orderstatus, count(DISTINCT o_custkey) GROUP BY o_orderstatus;
SELECT 'a' AS src, count(*) AS n, max(nd) AS mx FROM g64_a
UNION ALL
SELECT 'b' AS src, count(*) AS n, max(nd) AS mx FROM g64_b
