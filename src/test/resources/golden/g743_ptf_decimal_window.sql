-- clientpositive/ptf_decimal.q: windowing over a DECIMAL column keeps
-- decimal semantics through the frame arithmetic.
SELECT p_brand, p_name,
  round(sum(CAST(p_retailprice AS DECIMAL(12, 2)))
    OVER (PARTITION BY p_brand ORDER BY p_name), 2) AS s
FROM part
WHERE p_partkey < 40;
