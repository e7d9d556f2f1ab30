-- mixed static+dynamic PARTITION (a=static, b) spec
DROP TABLE IF EXISTS g233_p;
CREATE TABLE g233_p (k BIGINT) USING parquet PARTITIONED BY (src STRING, st STRING);
INSERT OVERWRITE TABLE g233_p PARTITION (src='orders', st)
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 200;
INSERT INTO TABLE g233_p PARTITION (src='extra', st='X')
SELECT o_orderkey FROM orders WHERE o_orderkey <= 10;
SELECT src, st, count(*) AS n FROM g233_p GROUP BY src, st
