-- cbo_windowing.q shape: windows over a global aggregate
-- (sum(sum(x)) over(), 1+sum(x) over() with empty OVER)
SELECT sum(n_nationkey) + sum(sum(n_nationkey)) OVER () AS v,
       count(count(1)) OVER () AS c
FROM nation
