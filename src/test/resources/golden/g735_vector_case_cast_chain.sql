-- vectorization_short_regress.q: CASE + CAST chains inside aggregates
-- (the Bool/String class legs).
SELECT l_returnflag,
       sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS big,
       sum(CAST(l_quantity AS INT) * 2) AS dq,
       round(avg(CASE WHEN l_discount < 0.05 THEN l_extendedprice END), 2) AS cheap_avg
FROM lineitem
WHERE l_orderkey < 2000
GROUP BY l_returnflag;
