-- reference: ql/src/test/queries/clientpositive/insert_into_with_schema.q
-- (HIVE-9481) — INSERT with a target COLUMN LIST: unnamed columns fill
-- NULL, VALUES and SELECT sources both reorder through the list, and a
-- FROM-first multi-insert may give each branch its own schema.
DROP TABLE IF EXISTS g1049_source;
DROP TABLE IF EXISTS g1049_t1;
DROP TABLE IF EXISTS g1049_t2;
CREATE TABLE g1049_source (s1 INT, s2 INT) USING parquet;
CREATE TABLE g1049_t1 (x INT, y INT, z INT) USING parquet;
CREATE TABLE g1049_t2 (x INT, y INT, z INT) USING parquet;
INSERT INTO g1049_source (s2, s1) VALUES (2, 1);
INSERT INTO g1049_t1 (z, x) SELECT * FROM g1049_source;
FROM g1049_source INSERT INTO g1049_t1 (x, y) SELECT * INSERT INTO g1049_t2 (x, z) SELECT s2, s1;
FROM g1049_source
  INSERT INTO g1049_t1 (x, y, z) SELECT NULL AS x, *
  INSERT INTO g1049_t2 (x, y, z) SELECT NULL AS x, g1049_source.*;
SELECT 't1' AS tag, x, y, z FROM g1049_t1
UNION ALL
SELECT 't2', x, y, z FROM g1049_t2;
