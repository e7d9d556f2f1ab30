-- create_like.q variant: CREATE TABLE LIKE with a format override — the
-- clone takes the new storage format, keeps the source's schema.
DROP TABLE IF EXISTS g518_src;
DROP TABLE IF EXISTS g518_like;
CREATE TABLE g518_src (k INT, v STRING) STORED AS PARQUET;
INSERT INTO g518_src VALUES (1,'a'), (2,'b');
CREATE TABLE g518_like LIKE g518_src STORED AS SEQUENCEFILE;
INSERT INTO g518_like SELECT k + 10, upper(v) FROM g518_src;
SELECT 'src' AS t, k, v FROM g518_src
UNION ALL
SELECT 'like', k, v FROM g518_like
