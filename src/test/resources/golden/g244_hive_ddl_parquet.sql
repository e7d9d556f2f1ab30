-- STORED AS PARQUET + partitioned legacy DDL through the rewrite
DROP TABLE IF EXISTS g244_p;
CREATE TABLE g244_p (k BIGINT, v DOUBLE) PARTITIONED BY (st STRING) STORED AS PARQUET;
INSERT OVERWRITE TABLE g244_p PARTITION (st)
SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey <= 300;
SELECT st, count(*) AS n, round(sum(v) * 100) / 100 AS s FROM g244_p GROUP BY st
