-- ppd_repeated_alias.q: the OUTER query reuses alias `a` for a derived
-- table built over an alias `a` inside — and the WHERE on the right
-- side's column collapses the LEFT OUTER to inner in both spellings.
SELECT * FROM
  (SELECT a.n_nationkey AS foo1, b.n_nationkey AS foo2, b.n_regionkey AS bar
   FROM nation a LEFT OUTER JOIN nation b ON a.n_nationkey = b.n_nationkey) a
WHERE a.bar = 3
