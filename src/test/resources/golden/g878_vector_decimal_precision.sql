-- vector_decimal_precision.q: decimal(20,10) arithmetic keeps exact
-- values through +/-/*//, division widens scale, and a product whose
-- INTEGER digits cannot fit decimal(38,x) yields NULL (Hive overflow
-- contract, vector_decimal_precision.q.out pins NULL; Spark non-ANSI
-- matches), never a wrong number. KNOWN DIVERGENCE: when only the
-- SCALE must shrink to fit (integer digits still ≤ 32), Spark's
-- precision-loss rule keeps a rounded value where the reference NULLs
-- (its result scale never shrinks below s1+s2) — pinned here is the
-- true integer-overflow case, which NULLs in both.
DROP TABLE IF EXISTS g878_dp;
CREATE TABLE g878_dp (dec DECIMAL(20,10)) USING parquet;
INSERT INTO g878_dp VALUES (1234567890.1234567890), (0.1), (125.2), (NULL);
SELECT dec,
       dec + 1 AS plus1, dec - 1 AS minus1,
       dec * 2 AS times2, dec / 9 AS div9,
       dec * dec AS sq,
       dec * dec * dec * dec AS quad_overflow
FROM g878_dp ORDER BY dec
