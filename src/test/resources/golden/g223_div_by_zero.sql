-- non-ANSI division/modulo by zero yields NULL (Hive parity), not an error
SELECT o_orderkey, o_orderkey / (o_orderkey % 3) AS div3,
       o_orderkey % (o_orderkey % 3) AS mod3,
       o_orderkey DIV (o_orderkey % 3) AS idiv3
FROM orders WHERE o_orderkey <= 12
