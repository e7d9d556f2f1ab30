-- ALTER TABLE SET FILEFORMAT AVRO: rows re-land through the from-scratch
-- avro source via the CTAS swap; data identical after the flip.
DROP TABLE IF EXISTS g508_t;
CREATE TABLE g508_t (k INT, v STRING) STORED AS PARQUET;
INSERT INTO g508_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5;
ALTER TABLE g508_t SET FILEFORMAT AVRO;
SELECT k, v FROM g508_t
