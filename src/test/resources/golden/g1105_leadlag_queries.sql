-- reference: ql/src/test/queries/clientpositive/leadlag_queries.q —
-- lead/lag in every arity: bare, explicit offset, constant default,
-- COLUMN default, and the size-1 partition shape where the offset
-- always falls off the edge (with an explicit ORDER BY — Spark
-- requires one for lead/lag; on size-1 partitions the result is
-- identical to the stem's order-free form).
SELECT p_brand, p_retailprice,
  lead(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name) AS l1,
  lead(p_retailprice, 1) OVER (PARTITION BY p_brand ORDER BY p_name) AS l2,
  lead(p_retailprice, 1, 10) OVER (PARTITION BY p_brand ORDER BY p_name) AS l3,
  lead(p_retailprice, 1, p_retailprice)
    OVER (PARTITION BY p_brand ORDER BY p_name) AS l4,
  lag(p_retailprice, 1) OVER (PARTITION BY p_brand ORDER BY p_name) AS g1,
  lag(p_retailprice, 1, p_retailprice)
    OVER (PARTITION BY p_brand ORDER BY p_name) AS g3,
  lead(p_retailprice, 1)
    OVER (PARTITION BY p_brand, p_name ORDER BY p_retailprice) AS sz1,
  p_retailprice - lag(p_retailprice, 1, p_retailprice)
    OVER (PARTITION BY p_brand ORDER BY p_name) AS diff
FROM part
WHERE p_partkey < 60
