-- vectorization_short_regress.q (FilterOps classes): Equal / NotEqual /
-- GreaterThan / LessThanOrEqual mixed over numeric and string columns.
SELECT count(1) AS n,
       round(sum(l_extendedprice * l_discount), 2) AS rev,
       max(l_linenumber) AS mx
FROM lineitem
WHERE (l_linenumber = 1 OR l_linenumber != 3)
  AND l_quantity > 10
  AND l_extendedprice <= 50000
  AND l_linestatus <> 'Z';
