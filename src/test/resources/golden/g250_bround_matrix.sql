-- round vs bround (banker's) on exact decimal ties + negative digits
SELECT round(CAST(2.5 AS DECIMAL(3,1))) AS r25, bround(CAST(2.5 AS DECIMAL(3,1))) AS b25,
       round(CAST(3.5 AS DECIMAL(3,1))) AS r35, bround(CAST(3.5 AS DECIMAL(3,1))) AS b35,
       round(CAST(2.45 AS DECIMAL(4,2)), 1) AS r245, bround(CAST(2.45 AS DECIMAL(4,2)), 1) AS b245,
       round(123.45, -1) AS rneg, bround(125.0, -1) AS bneg,
       floor(CAST(-2.5 AS DOUBLE)) AS fneg, ceil(CAST(-2.5 AS DOUBLE)) AS cneg
FROM region WHERE r_regionkey = 0
