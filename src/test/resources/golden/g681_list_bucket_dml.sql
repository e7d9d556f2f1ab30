-- list_bucket_dml_2.q: DML into a SKEWED BY ... STORED AS DIRECTORIES
-- table — the list-bucketing hint is accepted (skew handled at runtime
-- by AQE instead of directory fan-out), inserts and reads answer
-- identically to the plain table.
DROP TABLE IF EXISTS g681_t;
CREATE TABLE g681_t (k INT, v STRING)
SKEWED BY (k) ON ((0), (7)) STORED AS DIRECTORIES
STORED AS PARQUET;
INSERT INTO g681_t SELECT CASE WHEN n_nationkey % 3 = 0 THEN 7 ELSE n_nationkey END, n_name FROM nation;
SELECT 'hot' AS tag, COUNT(*) AS n FROM g681_t WHERE k = 7
UNION ALL
SELECT 'all', COUNT(*) FROM g681_t
