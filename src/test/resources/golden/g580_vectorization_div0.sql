-- vectorization_div0.q: division by zero yields NULL, never an error —
-- double/0.0, bigint/0, decimal/0, and the shifted-denominator forms.
SELECT l_orderkey,
  l_extendedprice / 0.0 AS d_div0,
  l_orderkey / 0 AS i_div0,
  CAST(l_quantity AS DECIMAL(10,2)) / 0 AS dec_div0,
  1.2 / (l_quantity - l_quantity) AS shift_div0,
  l_orderkey % 0 AS mod0,
  l_orderkey DIV 0 AS intdiv0
FROM lineitem WHERE l_orderkey < 5
