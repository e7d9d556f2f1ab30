DROP TABLE IF EXISTS g63_a;
DROP TABLE IF EXISTS g63_b;
CREATE TABLE g63_a (k BIGINT, n BIGINT) USING parquet;
CREATE TABLE g63_b (k STRING, tot DOUBLE) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g63_a SELECT o_custkey, count(*) WHERE o_orderkey < 500 GROUP BY o_custkey
INSERT OVERWRITE TABLE g63_b SELECT o_orderstatus, sum(o_totalprice) GROUP BY o_orderstatus;
SELECT 'a' AS src, count(*) AS rows_out, sum(n) AS chk FROM g63_a
UNION ALL
SELECT 'b' AS src, count(*) AS rows_out, sum(tot) AS chk FROM g63_b
