-- bucketsortoptimize_insert_2.q shape: INSERT OVERWRITE a bucketed+sorted
-- table from a join of two bucketed+sorted tables, then verify rows.
DROP TABLE IF EXISTS g460_a;
DROP TABLE IF EXISTS g460_b;
DROP TABLE IF EXISTS g460_out;
CREATE TABLE g460_a (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g460_b (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
CREATE TABLE g460_out (key INT, v1 STRING, v2 STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT INTO g460_a VALUES (0,'a0'), (1,'a1'), (2,'a2'), (3,'a3'), (5,'a5');
INSERT INTO g460_b VALUES (0,'b0'), (2,'b2'), (3,'b3'), (4,'b4'), (5,'b5');
INSERT OVERWRITE TABLE g460_out
SELECT a.key, a.value, b.value FROM g460_a a JOIN g460_b b ON a.key = b.key;
SELECT key, v1, v2 FROM g460_out
