-- vector_decimal_4.q: decimal(35,25) storage (kv7-style values incl.
-- an overflow-to-NULL 1E+99 and a 25-digit fraction), derived column
-- key * 3 lands in a second decimal(35,25) table via enforced insert.
DROP TABLE IF EXISTS g953_d41;
DROP TABLE IF EXISTS g953_d42;
CREATE TABLE g953_d41 (key DECIMAL(35,25), value INT) USING parquet;
INSERT INTO g953_d41 VALUES
  (CAST('-4400' AS DECIMAL(35,25)), 4400),
  (CAST('1E+99' AS DECIMAL(35,25)), 0),
  (CAST('1E-99' AS DECIMAL(35,25)), 0),
  (CAST('0.9999999999999999999999999' AS DECIMAL(35,25)), 1),
  (CAST('-1.122' AS DECIMAL(35,25)), -11),
  (CAST('3.14' AS DECIMAL(35,25)), 3),
  (CAST('124.00' AS DECIMAL(35,25)), 124);
CREATE TABLE g953_d42 (key DECIMAL(35,25), value DECIMAL(35,25))
  USING parquet;
INSERT OVERWRITE TABLE g953_d42 SELECT key, key * 3 FROM g953_d41;
SELECT * FROM g953_d42
