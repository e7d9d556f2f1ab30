-- skewjoin_union_remove shape: FROM-union fan-out into two sinks
DROP TABLE IF EXISTS g178_a;
DROP TABLE IF EXISTS g178_b;
CREATE TABLE g178_a (k STRING, n BIGINT) USING parquet;
CREATE TABLE g178_b (k STRING, n BIGINT) USING parquet;
FROM (SELECT o_orderstatus AS k, count(1) AS n FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderpriority AS k, count(1) AS n FROM orders GROUP BY o_orderpriority) u
INSERT OVERWRITE TABLE g178_a SELECT k, n WHERE n > 100
INSERT OVERWRITE TABLE g178_b SELECT k, n WHERE n <= 100;
SELECT 'a' AS src, k, n FROM g178_a UNION ALL SELECT 'b' AS src, k, n FROM g178_b
