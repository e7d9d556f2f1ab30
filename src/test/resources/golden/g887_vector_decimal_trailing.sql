-- vector_decimal_trailing.q: decimal(10,4)/decimal(15,8) columns keep
-- their declared scale through storage and read-back — 0.3 in a (10,4)
-- column reads 0.3000, never 0.3 or 0.30000001.
DROP TABLE IF EXISTS g887_tr;
CREATE TABLE g887_tr (id INT, a DECIMAL(10,4), b DECIMAL(15,8)) USING parquet;
INSERT INTO g887_tr VALUES
  (1, 0.3, 0.3), (2, 104.45, 104.45678), (3, NULL, 0), (4, -2.4, -2.40000001);
SELECT id, a, b FROM g887_tr ORDER BY id
