-- alter_fileformat.q: ALTER TABLE SET FILEFORMAT — Hive flips serde
-- metadata; the CoW interpretation rewrites rows into the new format so
-- the table stays readable. parquet -> TEXTFILE (exercises the \001/\N
-- LazySimpleSerDe layout incl. NULL round-trip) -> ORC.
DROP TABLE IF EXISTS g307_t;
CREATE TABLE g307_t (k INT, v STRING) USING parquet;
INSERT INTO g307_t VALUES (1, 'a'), (2, NULL), (3, 'c');
ALTER TABLE g307_t SET FILEFORMAT TEXTFILE;
ALTER TABLE g307_t SET FILEFORMAT ORC;
SELECT k, v FROM g307_t ORDER BY k;
