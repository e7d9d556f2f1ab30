-- decimal_precision.q: arithmetic over DECIMAL(20,10) — +, -, *, and
-- the /3 and /9 divisions whose repeating expansions must truncate at
-- the result scale, plus avg/sum and a high-precision multiply.
DROP TABLE IF EXISTS g832_dp;
CREATE TABLE g832_dp (dec DECIMAL(20,10)) USING parquet;
INSERT INTO g832_dp VALUES
  (cast('0.1234567890' as decimal(20,10))),
  (cast('123456789.0123456789' as decimal(20,10))),
  (cast('-4.4' as decimal(20,10))),
  (cast('0' as decimal(20,10))),
  (NULL);
SELECT dec, dec + 1 AS p1, dec - 1 AS m1, dec * 2 AS t2,
       dec / 3 AS d3, dec / 9 AS d9, dec * dec AS sq
FROM g832_dp
