-- subquery_exists.q: correlated EXISTS on two equi-columns plus a filter
SELECT count(*) AS n FROM orders b WHERE EXISTS (
  SELECT a.o_orderkey FROM orders a
  WHERE a.o_custkey = b.o_custkey AND a.o_orderstatus = b.o_orderstatus
    AND a.o_totalprice > 150000)
