-- vector_decimal_math_funcs.q: the math-function battery over DECIMAL
-- input — each function promotes through double exactly as the
-- reference's vectorized expressions do; log of a negative is NULL,
-- sign returns the int sign, positive/negative are identity/negation.
DROP TABLE IF EXISTS g886_m;
CREATE TABLE g886_m (cdecimal1 DECIMAL(20,10)) USING parquet;
INSERT INTO g886_m VALUES (2.5), (16), (-3.25), (0.0625);
SELECT cdecimal1,
       round(cdecimal1, 2) AS r2, round(cdecimal1) AS r0,
       floor(cdecimal1) AS fl, ceil(cdecimal1) AS ce,
       ln(cdecimal1) AS lnv, log10(cdecimal1) AS l10, log2(cdecimal1) AS l2,
       power(log2(cdecimal1), 2.0) AS pw,
       sqrt(cdecimal1) AS sq, abs(cdecimal1) AS ab,
       sin(cdecimal1) AS sn, cos(cdecimal1) AS cs, atan(cdecimal1) AS at,
       degrees(cdecimal1) AS dg, radians(cdecimal1) AS rd,
       positive(cdecimal1) AS pos, negative(cdecimal1) AS neg,
       sign(cdecimal1) AS sg
FROM g886_m ORDER BY cdecimal1
