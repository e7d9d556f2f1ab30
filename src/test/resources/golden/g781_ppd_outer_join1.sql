-- ppd_outer_join1.q: FROM-first LEFT OUTER JOIN whose WHERE filters
-- BOTH sides (b.key bounds turn the outer join inner) — pushdown must
-- preserve Hive's post-join filter semantics.
FROM nation a
LEFT OUTER JOIN nation b ON a.n_nationkey = b.n_nationkey
SELECT a.n_nationkey, a.n_name, b.n_nationkey AS bk, b.n_name AS bn
WHERE a.n_nationkey > 10 AND a.n_nationkey < 20 AND b.n_nationkey > 15 AND b.n_nationkey < 25
