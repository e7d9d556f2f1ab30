-- vectorization_decimal_date.q: decimal arithmetic keeps scale, date
-- arithmetic over cast columns (datediff/date_add/date_sub/to_date).
SELECT o_orderkey,
  CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,1)) AS dec_mul,
  CAST(o_totalprice AS DECIMAL(12,2)) - CAST(100 AS DECIMAL(12,2)) AS dec_sub,
  DATEDIFF(DATE_ADD(o_orderdate, 30), o_orderdate) AS dd30,
  DATE_SUB(o_orderdate, 10) AS dminus,
  YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS yyyymm,
  TO_DATE(CONCAT(CAST(YEAR(o_orderdate) AS STRING), '-01-15')) AS jan15
FROM orders WHERE o_orderkey < 8
