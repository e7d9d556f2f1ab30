-- ptf.q (testGroupByHavingWithSWQAndAlias shape): windowing over an
-- aggregated subquery with HAVING.
SELECT p_brand, cnt,
  rank() OVER (ORDER BY cnt DESC, p_brand) AS r
FROM (SELECT p_brand, count(1) AS cnt FROM part GROUP BY p_brand
      HAVING count(1) > 1) t;
