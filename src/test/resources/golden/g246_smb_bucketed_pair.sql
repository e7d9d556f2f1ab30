-- smb_mapjoin shape: two co-bucketed sorted tables joined on the bucket key
DROP TABLE IF EXISTS g246_a;
DROP TABLE IF EXISTS g246_b;
CREATE TABLE g246_a (k BIGINT, v DOUBLE) USING parquet
CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g246_b (k BIGINT, w STRING) USING parquet
CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT OVERWRITE TABLE g246_a SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 2000;
INSERT OVERWRITE TABLE g246_b SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 1000;
SELECT w, count(*) AS n, round(sum(v) * 100) / 100 AS s
FROM g246_a a JOIN g246_b b ON a.k = b.k GROUP BY w
