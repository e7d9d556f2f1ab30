-- load_dyn_part3.q / merge_dynamic_partition.q shape: two dynamic
-- partition columns, then a mixed static+dynamic overwrite of one subtree
DROP TABLE IF EXISTS g366_p;
CREATE TABLE g366_p (k BIGINT, v DOUBLE) USING parquet PARTITIONED BY (st STRING, rf STRING);
INSERT OVERWRITE TABLE g366_p PARTITION (st, rf)
SELECT l_orderkey, l_extendedprice, l_linestatus, l_returnflag FROM lineitem WHERE l_orderkey <= 100;
INSERT OVERWRITE TABLE g366_p PARTITION (st='O', rf)
SELECT l_orderkey, 0.0, l_returnflag FROM lineitem WHERE l_orderkey <= 40 AND l_linestatus = 'O';
SELECT st, rf, count(*) AS n, round(sum(v) * 100) / 100 AS s FROM g366_p GROUP BY st, rf
