-- load_dyn_part8.q shape: one FROM scan multi-inserted into BOTH a
-- dynamic-partition overwrite and a static-partition overwrite of the
-- same table.
set hive.exec.dynamic.partition.mode=nonstrict;
DROP TABLE IF EXISTS g447_p;
CREATE TABLE g447_p (k BIGINT, v DOUBLE) PARTITIONED BY (rf STRING) STORED AS PARQUET;
FROM lineitem
INSERT OVERWRITE TABLE g447_p PARTITION (rf)
  SELECT l_orderkey, l_extendedprice, l_returnflag WHERE l_orderkey <= 60
INSERT OVERWRITE TABLE g447_p PARTITION (rf='X')
  SELECT l_orderkey, l_discount WHERE l_orderkey <= 20;
SELECT rf, count(*) AS n, round(sum(v) * 100) / 100 AS s FROM g447_p GROUP BY rf
