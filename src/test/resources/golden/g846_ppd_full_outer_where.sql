-- ppd_outer_join3.q: FULL OUTER JOIN whose WHERE constrains BOTH sides
-- — null-rejecting predicates on each side collapse the full outer to
-- inner over the overlap band.
SELECT a.o_orderkey AS ak, a.o_orderstatus AS av,
       b.o_orderkey AS bk, b.o_orderstatus AS bv
FROM orders a FULL OUTER JOIN orders b ON (a.o_orderkey = b.o_orderkey)
WHERE a.o_orderkey > 10 AND a.o_orderkey < 200
  AND b.o_orderkey > 150 AND b.o_orderkey < 250
