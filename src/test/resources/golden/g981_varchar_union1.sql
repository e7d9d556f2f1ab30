-- varchar_union1.q: UNION ALL over varchar columns — same length,
-- different lengths (common type = the wider varchar) and
-- varchar-with-string (common type = string) — trailing spaces survive
-- in every leg.
DROP TABLE IF EXISTS g981_vc1;
DROP TABLE IF EXISTS g981_vc2;
DROP TABLE IF EXISTS g981_str;
CREATE TABLE g981_vc1 (c1 INT, c2 VARCHAR(10)) USING parquet;
CREATE TABLE g981_vc2 (c1 INT, c2 VARCHAR(20)) USING parquet;
CREATE TABLE g981_str (c1 INT, c2 STRING) USING parquet;
INSERT INTO g981_vc1 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g981_vc2 VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
INSERT INTO g981_str VALUES (1, 'abc'), (2, 'abc '), (3, ' abc');
SELECT 'vc_vc' AS probe, c1, c2, length(c2) AS len FROM (
  SELECT * FROM g981_vc1
  UNION ALL
  SELECT * FROM (SELECT * FROM g981_vc1 ORDER BY c1 LIMIT 1) a
) q1
UNION ALL
SELECT 'vc_diff' AS probe, c1, c2, length(c2) AS len FROM (
  SELECT * FROM g981_vc1
  UNION ALL
  SELECT * FROM (SELECT * FROM g981_vc2 ORDER BY c1 LIMIT 1) b
) q2
UNION ALL
SELECT 'vc_str' AS probe, c1, c2, length(c2) AS len FROM (
  SELECT * FROM g981_vc1
  UNION ALL
  SELECT * FROM (SELECT * FROM g981_str ORDER BY c1 LIMIT 1) c
) q3
