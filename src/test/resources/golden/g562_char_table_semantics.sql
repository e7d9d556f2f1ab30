-- char_1.q / char_comparison.q / char_join1.q: CHAR(n)/VARCHAR(n) as
-- TABLE column types. Hive reads char through the STRIPPED value
-- everywhere except display (PrimitiveObjectInspectorUtils.getString
-- CHAR case; HiveChar.getCharacterLength): concat sees no pad, length
-- counts the content, char-vs-string comparison strips the char side
-- (so a pad-length literal does NOT match), char=varchar joins match on
-- content. Re-pinned in round 14 when CharStripReads landed — the
-- previous .out had baked in Spark's padded read-side values.
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
-- the bare literal matches the stripped char; the pad-length literal
-- does NOT (Hive strips the char side of a char-vs-string compare)
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
