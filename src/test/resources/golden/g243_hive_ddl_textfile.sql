-- groupby_grouping_sets1.q opening shape: legacy ROW FORMAT DELIMITED DDL,
-- populated, then cube-aggregated (LOAD DATA replaced by INSERT)
DROP TABLE IF EXISTS g243_t1;
CREATE TABLE g243_t1 (a STRING, b STRING, c STRING)
ROW FORMAT DELIMITED FIELDS TERMINATED BY ' ' STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g243_t1
SELECT o_orderstatus, o_orderpriority, CAST(o_custkey % 3 AS STRING)
FROM orders WHERE o_orderkey <= 500;
SELECT a, b, count(*) AS n FROM g243_t1 GROUP BY a, b WITH CUBE
