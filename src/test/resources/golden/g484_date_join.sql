-- date_join1.q: equi-join on a DATE column, plus date range predicate in
-- the ON clause.
SELECT o1.o_orderkey AS k1, o2.o_orderkey AS k2, o1.o_orderdate AS d
FROM orders o1 JOIN orders o2
  ON o1.o_orderdate = o2.o_orderdate
 AND o1.o_orderkey < o2.o_orderkey
 AND o1.o_orderdate < '1992-03-01'
WHERE o1.o_orderkey < 3000 AND o2.o_orderkey < 3000
