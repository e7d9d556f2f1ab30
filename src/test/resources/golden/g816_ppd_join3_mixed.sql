-- ppd_join3.q: three-way join of filtered derived tables with extra
-- predicates split between the ON clauses and the WHERE (<> filters on
-- every leg must each reach their own scan).
SELECT src1.c1, src2.c4
FROM (SELECT o_orderkey AS c1, o_orderstatus AS c2 FROM orders
      WHERE o_orderkey <> 11) src1
JOIN (SELECT o_orderkey AS c3, o_orderpriority AS c4 FROM orders
      WHERE o_orderkey <> 12) src2
  ON src1.c1 = src2.c3 AND src1.c1 < 400
JOIN (SELECT o_orderkey AS c5 FROM orders WHERE o_orderkey <> 13) src3
  ON src1.c1 = src3.c5
WHERE src1.c1 > 0 AND (src1.c2 <> 'F' OR src1.c1 > 1)
  AND (src2.c3 > 10 OR src1.c1 <> 10) AND (src2.c3 <> 4) AND (src3.c5 <> 1)
