-- nullgroup4_multi_distinct.q: multiple DISTINCT aggregates over a
-- predicate matching ZERO rows — a global aggregate still returns one
-- row of zeros.
SELECT count(1) AS c1,
       count(DISTINCT n_name) AS c2,
       count(DISTINCT substr(n_name, 3)) AS c3
FROM nation WHERE n_nationkey = 9999
