-- create_skewed_table1.q: SKEWED BY (list-bucketing metadata,
-- DDLSemanticAnalyzer analyzeSkewedValues). Skew is a runtime concern on
-- Spark (AQE skew-join), so the clause strips in the legacy-DDL rewrite;
-- the table must still create, write and read — including the \N NULL
-- marker of the TEXTFILE layout.
DROP TABLE IF EXISTS g304_t;
CREATE TABLE g304_t (key STRING, value STRING)
SKEWED BY (key) ON (('484'), ('51'), ('103'))
STORED AS TEXTFILE;
INSERT INTO g304_t VALUES ('484', 'x'), ('7', 'y'), (NULL, 'z');
SELECT key, value FROM g304_t ORDER BY value;
