-- INSERT OVERWRITE ... PARTITION (p) with p from data (dynamic partitions)
DROP TABLE IF EXISTS g232_p;
CREATE TABLE g232_p (k BIGINT, total DOUBLE) USING parquet PARTITIONED BY (st STRING);
INSERT OVERWRITE TABLE g232_p PARTITION (st)
SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey <= 300;
SELECT st, count(*) AS n FROM g232_p GROUP BY st
