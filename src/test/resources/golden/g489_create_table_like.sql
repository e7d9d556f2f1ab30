-- create_like.q: CREATE TABLE LIKE copies schema (not data); the clone
-- accepts inserts independently of the source.
DROP TABLE IF EXISTS g489_src;
DROP TABLE IF EXISTS g489_like;
CREATE TABLE g489_src (k INT, v STRING);
INSERT INTO g489_src VALUES (1,'a'), (2,'b');
CREATE TABLE g489_like LIKE g489_src;
INSERT INTO g489_like VALUES (7,'z');
SELECT 'src' AS t, k, v FROM g489_src
UNION ALL
SELECT 'like', k, v FROM g489_like
