-- CTAS with partitioning
DROP TABLE IF EXISTS g234_c;
CREATE TABLE g234_c USING parquet PARTITIONED BY (st) AS
SELECT o_orderkey AS k, o_totalprice AS tp, o_orderstatus AS st FROM orders WHERE o_orderkey <= 400;
SELECT st, count(*) AS n, min(k) AS mk FROM g234_c GROUP BY st
