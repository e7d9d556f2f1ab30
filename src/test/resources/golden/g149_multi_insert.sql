DROP TABLE IF EXISTS g149_a;
DROP TABLE IF EXISTS g149_b;
CREATE TABLE g149_a (k BIGINT, p DOUBLE) USING parquet;
CREATE TABLE g149_b (s STRING, n BIGINT) USING parquet;
FROM orders o
INSERT OVERWRITE TABLE g149_a SELECT o.o_orderkey, o.o_totalprice WHERE o.o_totalprice > 400000
INSERT OVERWRITE TABLE g149_b SELECT o.o_orderstatus, count(*) GROUP BY o.o_orderstatus;
SELECT s, n, (SELECT count(*) FROM g149_a) AS n_hi FROM g149_b ORDER BY s
