-- udf_bitwise_*.q + str REGEXP: the REGEXP keyword as an infix operator
-- (FunctionRegistry registers regexp = rlike) and the bitwise operator
-- family & | ^ ~ plus shiftleft/shiftright and integer DIV.
SELECT 'abc' REGEXP '^a'  AS re_pre,
       'abc' REGEXP 'd'   AS re_none,
       'NATION_12' REGEXP '^NATION_[0-9]+$' AS re_full,
       3 & 5  AS b_and,
       3 | 5  AS b_or,
       3 ^ 5  AS b_xor,
       ~3     AS b_not,
       shiftleft(1, 4)    AS shl,
       shiftright(256, 4) AS shr,
       7 DIV 2   AS idiv,
       -7 DIV 2  AS idiv_neg,
       7 % 3     AS mod_pos;
