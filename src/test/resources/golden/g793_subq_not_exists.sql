-- cbo_subq_exists.q: correlated NOT EXISTS with DISTINCT in the subquery,
-- and NOT EXISTS inside HAVING over a grouped outer query.
SELECT r_regionkey, cnt FROM (
  SELECT r_regionkey, count(*) AS cnt
  FROM region b
  WHERE NOT EXISTS (SELECT DISTINCT a.n_regionkey FROM nation a
                    WHERE b.r_regionkey = a.n_regionkey
                      AND a.n_nationkey > 20)
  GROUP BY r_regionkey
  HAVING NOT EXISTS (SELECT a.n_nationkey FROM nation a
                     WHERE a.n_regionkey = r_regionkey
                       AND a.n_nationkey > 23)
) t
