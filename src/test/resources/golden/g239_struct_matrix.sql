-- named_struct construction, field access, struct comparison ordering
SELECT s.k AS k, s.nm AS nm, st2.x + st2.y AS xy
FROM (SELECT named_struct('k', n_nationkey, 'nm', n_name) AS s,
             struct(n_nationkey + 1 AS x, n_regionkey * 2 AS y) AS st2
      FROM nation WHERE n_nationkey <= 10) t
ORDER BY s LIMIT 8
