-- vector_decimal_cast.q: casts INTO decimal from double/int/boolean/
-- timestamp (boolean→1.00/0.00, timestamp→epoch seconds as decimal),
-- and decimal values too precise for the target scale ROUND (Hive
-- HALF_UP on cast, e.g. 1.23456 → DECIMAL(5,2) = 1.23).
DROP TABLE IF EXISTS g879_dc;
CREATE TABLE g879_dc (d DOUBLE, i INT, bo BOOLEAN, ts TIMESTAMP) USING parquet;
INSERT INTO g879_dc VALUES
  (1.5, 7, true, TIMESTAMP '2020-01-01 00:00:10'),
  (-2.25, -3, false, TIMESTAMP '1970-01-01 00:01:40');
SELECT CAST(d AS DECIMAL(20,10)) AS d_dec,
       CAST(i AS DECIMAL(23,14)) AS i_dec,
       CAST(bo AS DECIMAL(5,2)) AS bo_dec,
       CAST(ts AS DECIMAL(15,0)) AS ts_dec,
       CAST(CAST('1.23456' AS DECIMAL(10,5)) AS DECIMAL(5,2)) AS narrowed
FROM g879_dc ORDER BY i
