-- groupby_grouping_sets2.q: WITH CUBE aggregating an EXPRESSION over two
-- columns (sum(c+d)) after staging through an INSERT OVERWRITE.
DROP TABLE IF EXISTS g797_t2;
CREATE TABLE g797_t2 (a STRING, b STRING, c INT, d INT) USING parquet;
INSERT OVERWRITE TABLE g797_t2
SELECT r_name, cast(n_nationkey % 3 AS STRING), n_nationkey, n_nationkey
FROM nation JOIN region ON n_regionkey = r_regionkey;
SELECT a, b, sum(c + d) AS s FROM g797_t2 GROUP BY a, b WITH CUBE
