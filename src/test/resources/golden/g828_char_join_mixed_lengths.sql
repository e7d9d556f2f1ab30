-- char_join1.q: joins keyed on CHAR columns of DIFFERENT declared
-- lengths, and CHAR against plain STRING (padding must not break the
-- equality, string-side compares unpadded).
DROP TABLE IF EXISTS g828_ch1;
DROP TABLE IF EXISTS g828_ch2;
DROP TABLE IF EXISTS g828_str;
CREATE TABLE g828_ch1 (c1 INT, c2 CHAR(10)) USING parquet;
CREATE TABLE g828_ch2 (c1 INT, c2 CHAR(20)) USING parquet;
CREATE TABLE g828_str (c1 INT, c2 STRING) USING parquet;
INSERT INTO g828_ch1 SELECT n_nationkey, substr(n_name, 1, 6) FROM nation WHERE n_nationkey < 8;
INSERT INTO g828_ch2 SELECT n_nationkey, substr(n_name, 1, 6) FROM nation WHERE n_nationkey < 12;
INSERT INTO g828_str SELECT n_nationkey, substr(n_name, 1, 6) FROM nation WHERE n_nationkey < 12;
SELECT a.c1 AS a1, a.c2 AS a2, b.c1 AS b1, s.c1 AS s1
FROM g828_ch1 a
JOIN g828_ch2 b ON a.c2 = b.c2
JOIN g828_str s ON a.c1 = s.c1
