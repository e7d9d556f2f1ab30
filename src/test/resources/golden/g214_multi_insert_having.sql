-- groupby_multi_single_reducer.q shape: one scan, three sinks, HAVING in branches
DROP TABLE IF EXISTS g214_a;
DROP TABLE IF EXISTS g214_b;
DROP TABLE IF EXISTS g214_c;
CREATE TABLE g214_a (k STRING, n BIGINT) USING parquet;
CREATE TABLE g214_b (k STRING, n BIGINT) USING parquet;
CREATE TABLE g214_c (k STRING, t DOUBLE) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g214_a SELECT o_orderstatus, count(*) GROUP BY o_orderstatus HAVING count(*) > 100
INSERT OVERWRITE TABLE g214_b SELECT o_orderpriority, count(*) GROUP BY o_orderpriority HAVING count(*) <= 400
INSERT OVERWRITE TABLE g214_c SELECT o_orderstatus, round(sum(o_totalprice) * 100) / 100 GROUP BY o_orderstatus;
SELECT 'a' AS src, k, CAST(n AS STRING) AS v FROM g214_a
UNION ALL SELECT 'b' AS src, k, CAST(n AS STRING) AS v FROM g214_b
UNION ALL SELECT 'c' AS src, k, CAST(t AS STRING) AS v FROM g214_c
