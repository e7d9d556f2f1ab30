-- CREATE TABLE LIKE inherits schema + provider
DROP TABLE IF EXISTS g260_src;
DROP TABLE IF EXISTS g260_cpy;
CREATE TABLE g260_src (k BIGINT, v STRING) USING parquet;
INSERT OVERWRITE TABLE g260_src SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 50;
CREATE TABLE g260_cpy LIKE g260_src;
INSERT INTO g260_cpy SELECT * FROM g260_src WHERE k <= 20;
SELECT count(*) AS n, max(v) AS mv FROM g260_cpy
