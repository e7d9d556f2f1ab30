-- clientpositive/vectorization_short_regress.q (Long class): nested
-- arithmetic over aggregates — Avg/Sum/StDevP/StDevSamp/VarSamp with
-- Add/Multiply/Subtract chains (whole-stage codegen exercises the same
-- expression soup the reference vectorizes).
SELECT round(AVG(l_quantity), 4) AS a,
       round(AVG(l_quantity) + -3728, 4) AS b,
       round(-(AVG(l_quantity) + -3728), 4) AS c,
       round((-(-(AVG(l_quantity) + -3728))) * (AVG(l_quantity) + -3728), 4) AS d,
       round(SUM(l_extendedprice), 2) AS e,
       round(STDDEV_POP(l_quantity), 4) AS f,
       round(STDDEV_SAMP(l_linenumber), 4) AS g,
       round(VAR_SAMP(l_quantity), 4) AS h
FROM lineitem
WHERE l_orderkey < 1000;
