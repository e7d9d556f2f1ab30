SELECT '10' = 10 AS a, '3.0' > 2 AS b, 5 = '5' AS c,
  concat('x', 1) AS d, '7' + 1 AS e, true = 1 AS f,
  CAST('12abc' AS INT) AS g, '' = 0 AS h
