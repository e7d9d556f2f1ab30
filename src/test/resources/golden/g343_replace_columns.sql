-- alter_replace_columns.q: REPLACE COLUMNS remaps the data columns
-- POSITIONALLY — old column 1 feeds new column 1 (renamed + recast),
-- excess old columns drop, growth NULL-fills; partition columns stay.
DROP TABLE IF EXISTS g343_t;
CREATE TABLE g343_t (a INT, b STRING, c DOUBLE) USING parquet;
INSERT INTO g343_t VALUES (1, '7', 1.5), (2, '8', 2.5);
ALTER TABLE g343_t REPLACE COLUMNS (x BIGINT, y INT, z STRING, w STRING);
SELECT x, y, z, w FROM g343_t ORDER BY x;
