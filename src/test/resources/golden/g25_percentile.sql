SELECT l_returnflag, percentile(l_quantity, 0.5) AS med FROM lineitem GROUP BY l_returnflag
