SELECT a.o_orderkey, b.o_orderkey AS later_key
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderdate < b.o_orderdate
WHERE a.o_custkey < 12
