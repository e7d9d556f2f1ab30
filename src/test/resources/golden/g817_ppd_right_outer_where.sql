-- ppd_outer_join2.q: RIGHT OUTER JOIN where the WHERE filters BOTH
-- sides — predicates on the preserved side push down, predicates on the
-- null-supplying side turn the outer join inner-like; the survivors are
-- the overlap band.
SELECT a.o_orderkey AS ak, a.o_orderstatus AS av,
       b.o_orderkey AS bk, b.o_orderstatus AS bv
FROM orders a RIGHT OUTER JOIN orders b ON (a.o_orderkey = b.o_orderkey)
WHERE a.o_orderkey > 10 AND a.o_orderkey < 200
  AND b.o_orderkey > 150 AND b.o_orderkey < 250
