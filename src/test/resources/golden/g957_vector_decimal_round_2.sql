-- vector_decimal_round_2.q: round(decimal, n) across the full positive
-- and negative digit range — HALF_UP away from zero on the negative
-- value too (round(-125.315, 2) = -125.32), and negative n rounding
-- into the integer digits down to complete zeroing.
DROP TABLE IF EXISTS g957_d1;
CREATE TABLE g957_d1 (dec DECIMAL(38,18)) USING parquet;
INSERT INTO g957_d1 VALUES (CAST(55555 AS DECIMAL(38,18)));
DROP TABLE IF EXISTS g957_d2;
CREATE TABLE g957_d2 (pos DECIMAL(38,18), neg DECIMAL(38,18)) USING parquet;
INSERT INTO g957_d2
  VALUES (CAST(125.315 AS DECIMAL(38,18)), CAST(-125.315 AS DECIMAL(38,18)));
SELECT
  round(dec) AS d, round(dec, 0) AS d0, round(dec, 1) AS d1,
  round(dec, -1) AS dm1, round(dec, -2) AS dm2, round(dec, -3) AS dm3,
  round(dec, -4) AS dm4, round(dec, -5) AS dm5, round(dec, -6) AS dm6,
  p.pos AS pos, round(p.pos, 2) AS p2, round(p.pos, -2) AS pm2,
  round(p.neg) AS n, round(p.neg, 2) AS n2, round(p.neg, 3) AS n3,
  round(p.neg, -1) AS nm1, round(p.neg, -2) AS nm2, round(p.neg, -3) AS nm3
FROM g957_d1 CROSS JOIN g957_d2 p
