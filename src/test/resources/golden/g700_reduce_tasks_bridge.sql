-- mapred.reduce.tasks (HiveConf HADOOPNUMREDUCERS): Hive scripts steer
-- reducer count with it, so the engine bridges it to the shuffle
-- partition count — tasks=1 lands the aggregate's INSERT in exactly ONE
-- output file (observable via INPUT__FILE__NAME); -1 restores the
-- session default.
DROP TABLE IF EXISTS g700_t;
CREATE TABLE g700_t (s STRING, n BIGINT) USING parquet;
set mapred.reduce.tasks=1;
INSERT INTO g700_t SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus;
set mapred.reduce.tasks=-1;
SELECT count(DISTINCT f) AS n_files, sum(n) AS total
FROM (SELECT INPUT__FILE__NAME AS f, sum(n) AS n FROM g700_t GROUP BY 1)
