-- correlationoptimizer14.q-shape (ReduceSinkDeDuplication): a sorted
-- subquery re-sorted on the same key collapses into one shuffle; the
-- pinned contract is the ordered result.
set hive.optimize.reducededuplication=true;
SELECT ck, cnt FROM
  (SELECT o_custkey AS ck, count(1) AS cnt FROM orders
   GROUP BY o_custkey ORDER BY ck) t
ORDER BY ck LIMIT 20;
