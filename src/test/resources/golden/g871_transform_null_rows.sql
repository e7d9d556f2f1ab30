-- nullscript.q: TRANSFORM through `cat` over a table containing NULL
-- and empty-string rows — the script contract serializes NULL as \N
-- and they round-trip.
DROP TABLE IF EXISTS g871_ns;
CREATE TABLE g871_ns (key STRING) USING parquet;
INSERT INTO g871_ns VALUES ('a'), (NULL), (''), ('b');
SELECT count(*) AS n, count(key1) AS nonnull FROM
  (SELECT TRANSFORM(key) USING 'cat' AS key1 FROM g871_ns) t
