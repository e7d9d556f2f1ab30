-- join_filters.q matrix: the same filter in ON vs WHERE across join types,
-- over a tiny null-bearing VALUES fixture
DROP VIEW IF EXISTS g283_a;
DROP VIEW IF EXISTS g283_b;
CREATE TEMPORARY VIEW g283_a AS SELECT * FROM VALUES
  (1, 10), (2, CAST(NULL AS INT)), (CAST(NULL AS INT), 30), (4, 40) AS a(k, v);
CREATE TEMPORARY VIEW g283_b AS SELECT * FROM VALUES
  (1, 100), (3, CAST(NULL AS INT)), (CAST(NULL AS INT), 300), (4, 400) AS b(k, w);
SELECT 'inner_on' AS tag, a.k, a.v, b.w FROM g283_a a JOIN g283_b b ON a.k = b.k AND a.v > 15
UNION ALL
SELECT 'inner_where', a.k, a.v, b.w FROM g283_a a JOIN g283_b b ON a.k = b.k WHERE a.v > 15
UNION ALL
SELECT 'left_on', a.k, a.v, b.w FROM g283_a a LEFT JOIN g283_b b ON a.k = b.k AND a.v > 15
UNION ALL
SELECT 'left_where', a.k, a.v, b.w FROM g283_a a LEFT JOIN g283_b b ON a.k = b.k WHERE a.v > 15
UNION ALL
SELECT 'right_on', a.k, a.v, b.w FROM g283_a a RIGHT JOIN g283_b b ON a.k = b.k AND b.w > 150
UNION ALL
SELECT 'full_on', a.k, a.v, b.w FROM g283_a a FULL JOIN g283_b b ON a.k = b.k AND a.v > 15
