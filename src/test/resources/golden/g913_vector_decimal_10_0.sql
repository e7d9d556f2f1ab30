-- vector_decimal_10_0.q: DECIMAL with scale 0 — integer values survive the
-- round trip with no fractional artifacts and order numerically.
DROP TABLE IF EXISTS g913_d0;
CREATE TABLE g913_d0 (dec DECIMAL(10,0)) USING parquet;
INSERT INTO g913_d0 VALUES (1234567890), (-1234567890), (0), (42), (NULL);
SELECT dec FROM g913_d0 ORDER BY dec NULLS FIRST
