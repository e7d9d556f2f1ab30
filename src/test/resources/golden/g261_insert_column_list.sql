-- INSERT INTO t (subset columns): unlisted columns become NULL
DROP TABLE IF EXISTS g261_t;
CREATE TABLE g261_t (a INT, b STRING, c DOUBLE) USING parquet;
INSERT INTO g261_t (a, c) VALUES (1, 1.5), (2, 2.5);
INSERT INTO g261_t (b) VALUES ('only_b');
SELECT a, b, c FROM g261_t
