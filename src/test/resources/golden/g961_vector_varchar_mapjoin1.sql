-- vector_varchar_mapjoin1.q: the same three joins keyed on VARCHAR —
-- varchar KEEPS trailing spaces, so 'abc' and 'abc ' never match (the
-- char twin g960 collapses them), at both equal and different declared
-- lengths, and against a plain string column.
DROP TABLE IF EXISTS g961_vc1;
DROP TABLE IF EXISTS g961_vc2;
DROP TABLE IF EXISTS g961_str;
CREATE TABLE g961_vc1 (c1 INT, c2 VARCHAR(10)) USING parquet;
CREATE TABLE g961_vc2 (c1 INT, c2 VARCHAR(20)) USING parquet;
CREATE TABLE g961_str (c1 INT, c2 STRING) USING parquet;
INSERT INTO g961_vc1 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g961_vc2 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g961_str VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
SELECT 'vc_vc' AS probe, a.c1 AS a1, a.c2 AS ac2, b.c1 AS b1, b.c2 AS bc2
  FROM g961_vc1 a JOIN g961_vc1 b ON (a.c2 = b.c2)
UNION ALL
SELECT 'vc_diff' AS probe, a.c1, a.c2, b.c1, b.c2
  FROM g961_vc1 a JOIN g961_vc2 b ON (a.c2 = b.c2)
UNION ALL
SELECT 'vc_str' AS probe, a.c1, a.c2, b.c1, b.c2
  FROM g961_vc1 a JOIN g961_str b ON (a.c2 = b.c2)
