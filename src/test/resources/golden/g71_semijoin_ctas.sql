DROP TABLE IF EXISTS g71_t1;
DROP TABLE IF EXISTS g71_t2;
CREATE TABLE g71_t1 USING parquet AS SELECT CAST(n_nationkey AS INT) AS k, n_name AS v FROM nation WHERE n_nationkey <= 10;
CREATE TABLE g71_t2 USING parquet AS SELECT CAST(2 * k AS INT) AS k, v FROM g71_t1;
SELECT a.k, a.v FROM g71_t1 a LEFT SEMI JOIN g71_t2 b ON a.k = b.k AND b.k > 2
