-- typed numeric literal suffixes (Y/S/L) and scientific notation
SELECT 1Y AS ty, 2S AS sm, 3L AS bg, 4.5E2 AS sci, 0.5 AS dec_lit,
       CAST(1Y + 2S AS INT) AS promoted, 3L * 1000000000 AS big_mul
FROM region WHERE r_regionkey = 0
