-- limit_pushdown.q: a limited subquery feeding an outer aggregate.
SELECT count(1) AS n FROM
  (SELECT o_custkey FROM orders ORDER BY o_custkey LIMIT 100) t;
