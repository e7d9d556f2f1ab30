-- decimal_trailing.q: trailing zeros render at the column's declared
-- scale (0.0 in decimal(10,4) prints 0.0000; 17.2 prints 17.2000) — the
-- scale is part of the type, not the value.
DROP TABLE IF EXISTS g564_t;
CREATE TABLE g564_t (id INT, a DECIMAL(10,4), b DECIMAL(15,8)) USING parquet;
INSERT INTO g564_t VALUES
  (1, 100.1, 100.1), (2, 0.0, 0.0), (3, 17.2, 17.2),
  (4, 4.40, 4.400000), (5, NULL, 3), (6, 0.1, 0.001);
SELECT id, CAST(a AS STRING) AS a_s, CAST(b AS STRING) AS b_s FROM g564_t
