-- reference: ql/src/test/queries/clientpositive/lateral_view.q +
-- lateral_view_alias.q — chained LATERAL VIEWs (cross product of two
-- explodes), OUTER over an empty array, and alias scoping.
SELECT 'chained' AS tag, n_nationkey AS k, a.c1, b.c2 FROM nation
LATERAL VIEW explode(array(1, 2)) a AS c1
LATERAL VIEW explode(array('x', 'y')) b AS c2
WHERE n_nationkey < 2
UNION ALL
SELECT 'outer_empty', n_nationkey, c3, CAST(NULL AS STRING) FROM nation
LATERAL VIEW OUTER explode(CAST(array() AS ARRAY<INT>)) t AS c3
WHERE n_nationkey < 2
