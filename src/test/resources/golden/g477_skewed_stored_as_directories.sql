-- list_bucket_dml shape: SKEWED BY ... ON (...) STORED AS DIRECTORIES
-- DDL accepted (list-bucketing metadata), inserts and reads unaffected.
DROP TABLE IF EXISTS g477_t;
CREATE TABLE g477_t (key STRING, val STRING)
SKEWED BY (key) ON (('484'),('51')) STORED AS DIRECTORIES
STORED AS PARQUET;
INSERT INTO g477_t VALUES ('484','v484'), ('51','v51'), ('103','v103'), ('484','w484');
SELECT key, count(1) AS n FROM g477_t GROUP BY key
