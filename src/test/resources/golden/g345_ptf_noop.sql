-- ptf.q test 1 shape (reference ql/src/test/queries/clientpositive/ptf.q):
-- windowing over the identity PTF noop(on part partition by ... order by ...)
SELECT p_brand, p_name, p_size,
rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS r,
dense_rank() OVER (PARTITION BY p_brand ORDER BY p_name) AS dr,
sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
FROM noop(on part
  partition by p_brand
  order by p_name
  )
