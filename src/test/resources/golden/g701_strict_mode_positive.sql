-- the strict-mode POSITIVE path (complement of n077-n080): a query with
-- a join condition and a LIMIT-bounded ORDER BY runs under
-- hive.mapred.mode=strict exactly as it would nonstrict
DROP TABLE IF EXISTS g701_t;
CREATE TABLE g701_t (a STRING, b STRING) USING parquet;
SET hive.mapred.mode=strict;
INSERT INTO g701_t SELECT n.n_name, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey ORDER BY n.n_name LIMIT 5;
SET hive.mapred.mode=nonstrict;
SELECT a, b FROM g701_t
