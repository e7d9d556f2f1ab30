-- sample7.q: TABLESAMPLE (BUCKET 1 OUT OF 4 ON key) with an extra WHERE,
-- feeding INSERT OVERWRITE run TWICE (second overwrites, not appends) —
-- the ON-column bucket hash must be deterministic so both runs land the
-- identical sample.
DROP TABLE IF EXISTS g554_src;
DROP TABLE IF EXISTS g554_dest;
CREATE TABLE g554_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g554_dest (key INT, value STRING) USING parquet;
INSERT OVERWRITE TABLE g554_dest
  SELECT s.* FROM g554_src TABLESAMPLE (BUCKET 1 OUT OF 4 ON key) s
  WHERE s.key > 5;
INSERT OVERWRITE TABLE g554_dest
  SELECT s.* FROM g554_src TABLESAMPLE (BUCKET 1 OUT OF 4 ON key) s
  WHERE s.key > 5;
SELECT key, value FROM g554_dest
