-- CLUSTERED BY ... SORTED BY ... INTO n BUCKETS DDL text (q_test_init.sql srcbucket parity)
DROP TABLE IF EXISTS g231_bkt;
CREATE TABLE g231_bkt (k BIGINT, v DOUBLE)
USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT OVERWRITE TABLE g231_bkt SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500;
SELECT count(*) AS n, round(sum(v) * 100) / 100 AS s FROM g231_bkt WHERE k % 4 = 1
