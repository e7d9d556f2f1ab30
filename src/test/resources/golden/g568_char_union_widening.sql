-- char_union1.q / char_varchar_udf.q: UNION of CHAR(n) columns of
-- different lengths (widen to the larger), CHAR union VARCHAR, and
-- string functions over char/varchar table columns (upper, trim-aware
-- concat, substr).
DROP TABLE IF EXISTS g568_c1;
DROP TABLE IF EXISTS g568_c2;
DROP TABLE IF EXISTS g568_v;
CREATE TABLE g568_c1 (k INT, s CHAR(6)) USING parquet;
CREATE TABLE g568_c2 (k INT, s CHAR(10)) USING parquet;
CREATE TABLE g568_v (k INT, s VARCHAR(8)) USING parquet;
INSERT INTO g568_c1 VALUES (1, 'abc'), (2, 'defghi');
INSERT INTO g568_c2 VALUES (3, 'abc'), (4, 'jklmnopqrs');
INSERT INTO g568_v VALUES (5, 'abc'), (6, 'tuvwxyz');
SELECT 'cc' AS tag, CAST(k AS STRING) AS a, concat('[', s, ']') AS b
FROM (SELECT k, s FROM g568_c1 UNION ALL SELECT k, s FROM g568_c2) u
UNION ALL
SELECT 'cv', CAST(k AS STRING), concat('[', s, ']')
FROM (SELECT k, s FROM g568_c1 UNION ALL SELECT k, s FROM g568_v) u
UNION ALL
SELECT 'fns', CAST(k AS STRING), concat(upper(s), '/', substr(s, 2, 3), '/', CAST(length(s) AS STRING))
FROM g568_c1
