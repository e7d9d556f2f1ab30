-- IN over a UNION subquery
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
