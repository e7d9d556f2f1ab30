DROP TABLE IF EXISTS g101_t;
CREATE TABLE g101_t (k INT, v STRING) USING parquet;
INSERT INTO g101_t VALUES (1, 'a'), (2, 'b');
INSERT INTO g101_t SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 3;
SELECT k, v FROM g101_t
