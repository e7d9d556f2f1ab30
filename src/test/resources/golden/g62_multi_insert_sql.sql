DROP TABLE IF EXISTS g62_lo;
DROP TABLE IF EXISTS g62_hi;
CREATE TABLE g62_lo (o_orderkey BIGINT, o_totalprice DOUBLE) USING parquet;
CREATE TABLE g62_hi (o_orderkey BIGINT, o_totalprice DOUBLE) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g62_lo SELECT o_orderkey, o_totalprice WHERE o_totalprice < 150000
INSERT OVERWRITE TABLE g62_hi SELECT o_orderkey, o_totalprice WHERE o_totalprice >= 350000;
SELECT 'lo' AS side, count(*) AS n, sum(o_totalprice) AS tot FROM g62_lo
UNION ALL
SELECT 'hi' AS side, count(*) AS n, sum(o_totalprice) AS tot FROM g62_hi
