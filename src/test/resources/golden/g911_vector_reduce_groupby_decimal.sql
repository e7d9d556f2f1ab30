-- vector_reduce_groupby_decimal.q: GROUP BY over DECIMAL keys with
-- min/max of decimal measures — the group keys keep exact decimal
-- equality (no double drift), NULL keys group together.
DROP TABLE IF EXISTS g911_gd;
CREATE TABLE g911_gd (cint INT, cdecimal1 DECIMAL(20,10), cdecimal2 DECIMAL(23,14))
  USING parquet;
INSERT INTO g911_gd VALUES
  (1, 1.5, 2.25), (2, 1.5, 3.75), (3, -0.5, 1.0),
  (4, NULL, 4.5), (5, 1.5, NULL), (6, NULL, 0.125);
SELECT cdecimal1, count(*) AS n, min(cdecimal2) AS mn, max(cdecimal2) AS mx
FROM g911_gd GROUP BY cdecimal1 ORDER BY cdecimal1 NULLS FIRST
