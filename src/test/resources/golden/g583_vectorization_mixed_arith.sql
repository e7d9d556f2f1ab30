-- vectorization_short_regress.q mixed-type arithmetic: result types and
-- values for int-vs-double, division always fractional, DIV integral,
-- Java-sign % and positive pmod.
SELECT 5 / 2 AS div_frac,
       5 DIV 2 AS div_int,
       -7 % 3 AS mod_java,
       PMOD(-7, 3) AS pmod_pos,
       CAST(1 AS TINYINT) + 1.5 AS tiny_dbl,
       CAST(3 AS SMALLINT) * CAST(2 AS TINYINT) AS small_mul,
       2 + CAST(1.5 AS DECIMAL(3,1)) AS int_dec,
       '5' + 3 AS str_arith,
       10.0 % 3 AS dbl_mod,
       ROUND((0.1 + 0.2) * 1000000) / 1000000 AS dbl_sum
