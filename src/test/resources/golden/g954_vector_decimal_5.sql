-- vector_decimal_5.q: decimal(10,5) column re-cast DOWN — bare
-- `decimal` means decimal(10,0) in Hive, and cast to decimal(6,3)
-- NULLs the values whose integer part no longer fits (-1255.49 keeps,
-- 2389432.2375 overflows).
DROP TABLE IF EXISTS g954_d5;
CREATE TABLE g954_d5 (key DECIMAL(10,5), value INT) USING parquet;
INSERT INTO g954_d5 VALUES
  (CAST('-4400' AS DECIMAL(10,5)), 4400),
  (CAST('23232.23435' AS DECIMAL(10,5)), 2),
  (CAST('10.73433' AS DECIMAL(10,5)), 5),
  (CAST('-1255.49' AS DECIMAL(10,5)), -1255),
  (CAST('3.14' AS DECIMAL(10,5)), 3),
  (CAST('0.9999999999999999999999999' AS DECIMAL(10,5)), 1),
  (NULL, 0);
SELECT key, cast(key AS decimal(10,0)) AS d10, cast(key AS decimal(6,3)) AS d63
FROM g954_d5
