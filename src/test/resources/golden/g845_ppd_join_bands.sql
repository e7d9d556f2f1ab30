-- ppd_join.q / ppd1.q: join of two filtered derived tables with a mixed
-- ON/WHERE predicate band (OR branches straddling both sides must stay
-- ABOVE the join, <> and range filters push below).
SELECT src1.c1, src2.c4
FROM (SELECT o_orderkey AS c1, o_orderstatus AS c2 FROM orders
      WHERE o_orderkey > 1) src1
JOIN (SELECT o_orderkey AS c3, o_orderpriority AS c4 FROM orders
      WHERE o_orderkey > 2) src2
ON src1.c1 = src2.c3 AND src1.c1 < 400
WHERE src1.c1 > 20 AND (src1.c2 < 'O' OR src1.c1 > 2)
  AND (src2.c3 > 50 OR src1.c1 < 50) AND (src2.c3 <> 4)
