-- decimal_5.q: DECIMAL(10,5) values re-cast to default decimal and to a
-- NARROWER (6,3) type — values that overflow the narrow precision go
-- NULL, in-range values round half-up.
DROP TABLE IF EXISTS g831_dec;
CREATE TABLE g831_dec (key DECIMAL(10,5)) USING parquet;
INSERT INTO g831_dec VALUES
  (cast('-4400' as decimal(10,5))),
  (cast('1E-5' as decimal(10,5))),
  (cast('0.33333' as decimal(10,5))),
  (cast('-0.3' as decimal(10,5))),
  (cast('124.31' as decimal(10,5))),
  (cast('98765.43210' as decimal(10,5))),
  (NULL);
SELECT key, cast(key as decimal) AS d_default, cast(key as decimal(6,3)) AS d63
FROM g831_dec
