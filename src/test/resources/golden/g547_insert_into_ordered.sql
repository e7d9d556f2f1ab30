-- insert_into3.q: INSERT INTO (append) branches of a multi-insert, each
-- with its own ORDER BY + LIMIT; the statement runs TWICE so the second
-- pass must append, doubling every row.
DROP TABLE IF EXISTS g547_src;
DROP TABLE IF EXISTS g547_a;
DROP TABLE IF EXISTS g547_b;
CREATE TABLE g547_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g547_a (key INT, value STRING) USING parquet;
CREATE TABLE g547_b (key INT, value STRING) USING parquet;
FROM g547_src
INSERT INTO TABLE g547_a SELECT * ORDER BY key, value LIMIT 5
INSERT INTO TABLE g547_b SELECT * ORDER BY key DESC, value LIMIT 7;
FROM g547_src
INSERT INTO TABLE g547_a SELECT * ORDER BY key, value LIMIT 5
INSERT INTO TABLE g547_b SELECT * ORDER BY key DESC, value LIMIT 7;
SELECT 'a' AS v, key, count(*) AS n FROM g547_a GROUP BY key
UNION ALL
SELECT 'b', key, count(*) FROM g547_b GROUP BY key
