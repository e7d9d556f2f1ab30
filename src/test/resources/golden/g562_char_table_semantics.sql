-- char_1.q / char_comparison.q / char_join1.q: CHAR(n)/VARCHAR(n) as
-- TABLE column types — read-side blank padding, comparisons that ignore
-- the pad, char=varchar joins, GROUP BY on a char key, and length() over
-- the padded value.
DROP TABLE IF EXISTS g562_c;
DROP TABLE IF EXISTS g562_v;
CREATE TABLE g562_c (key INT, name CHAR(10)) USING parquet;
CREATE TABLE g562_v (key INT, name VARCHAR(10)) USING parquet;
INSERT INTO g562_c SELECT CAST(n_nationkey AS INT), substr(n_name, 1, 6) FROM nation WHERE n_nationkey < 8;
INSERT INTO g562_v SELECT CAST(n_nationkey AS INT), substr(n_name, 1, 6) FROM nation WHERE n_nationkey < 8;
SELECT 'len' AS tag, CAST(c.key AS STRING) AS a, concat('[', c.name, ']') AS b,
       CAST(length(c.name) AS STRING) AS x
FROM g562_c c WHERE c.key < 3
UNION ALL
-- CHAR-vs-STRING comparison pads the string side, so BOTH the padded
-- and unpadded literal match the CHAR(10) column — Hive's
-- pad-insensitive char comparison, on table-typed columns (the cast
-- divergence g286 documents applies only to bare CAST expressions)
SELECT 'cmp', CAST(key AS STRING),
       CAST(name = 'NATION    ' AS STRING),
       CAST(name = 'NATION' AS STRING)
FROM g562_c WHERE key = 0
UNION ALL
SELECT 'join_cv', CAST(c.key AS STRING), CAST(c.name AS STRING), CAST(v.name AS STRING)
FROM g562_c c JOIN g562_v v ON c.name = v.name AND c.key < 3
UNION ALL
SELECT 'group', CAST(count(*) AS STRING), CAST(name AS STRING), ''
FROM g562_c GROUP BY name HAVING count(*) > 0 AND name < 'C'
