-- vector_char_mapjoin1.q: broadcast (map) joins keyed on CHAR — same
-- length, different lengths, and char-vs-string. Char equality ignores
-- the trailing pad ('abc' written with a trailing space still matches),
-- while the char-vs-string leg compares through STRING where the
-- trailing space is significant (vc1.txt rows: 'abc', 'abc ', ' abc').
DROP TABLE IF EXISTS g960_vc1;
DROP TABLE IF EXISTS g960_vc2;
DROP TABLE IF EXISTS g960_str;
CREATE TABLE g960_vc1 (c1 INT, c2 CHAR(10)) USING parquet;
CREATE TABLE g960_vc2 (c1 INT, c2 CHAR(20)) USING parquet;
CREATE TABLE g960_str (c1 INT, c2 STRING) USING parquet;
INSERT INTO g960_vc1 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g960_vc2 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g960_str VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
SELECT 'char_char' AS probe, a.c1 AS a1, a.c2 AS ac2, b.c1 AS b1, b.c2 AS bc2
  FROM g960_vc1 a JOIN g960_vc1 b ON (a.c2 = b.c2)
UNION ALL
SELECT 'char_diff' AS probe, a.c1, a.c2, b.c1, b.c2
  FROM g960_vc1 a JOIN g960_vc2 b ON (a.c2 = b.c2)
UNION ALL
SELECT 'char_str' AS probe, a.c1, a.c2, b.c1, b.c2
  FROM g960_vc1 a JOIN g960_str b ON (a.c2 = b.c2)
