-- vector_decimal_round.q: round(decimal, -1) — negative scale rounds to
-- tens (101 → 100), and ORDER BY the rounded expression keeps working.
-- The reference runs the same query over text/rcfile/orc; storage is
-- orthogonal to the rounding semantics pinned here (format matrix is
-- g501/g68's job).
DROP TABLE IF EXISTS g877_dec;
CREATE TABLE g877_dec (dec DECIMAL(10,0)) USING parquet;
INSERT INTO g877_dec VALUES (101), (105), (94), (-101), (-105);
SELECT dec, round(dec, -1) AS r
FROM g877_dec ORDER BY round(dec, -1), dec
