WITH t AS (SELECT n_nationkey AS k, array(n_nationkey, n_regionkey, 7, 2) AS xs
           FROM nation WHERE n_nationkey < 6)
SELECT k, transform(xs, x -> x * 2) AS doubled,
  filter(xs, x -> x % 2 = 0) AS evens,
  aggregate(xs, 0L, (acc, x) -> acc + x) AS total,
  exists(xs, x -> x > 5) AS any_big,
  forall(xs, x -> x >= 0) AS all_nonneg,
  zip_with(xs, xs, (a, b) -> a + b) AS zsum,
  reduce(xs, 1L, (acc, x) -> acc * (x + 1)) AS prod1
FROM t
