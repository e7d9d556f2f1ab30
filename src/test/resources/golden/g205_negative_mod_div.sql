-- Hive arithmetic dialect: % keeps the dividend sign, int/int is DOUBLE, DIV is integer
SELECT (0 - o_orderkey) % 3 AS neg_mod, o_orderkey % 3 AS pos_mod,
       o_orderkey / 4 AS div_double, o_orderkey DIV 4 AS div_int,
       pmod(0 - o_orderkey, 3) AS pm
FROM orders WHERE o_orderkey <= 10
