-- vectorization_short_regress.q semantics: wide mixed-type arithmetic aggregate
SELECT l_returnflag,
  count(*) AS n,
  sum(CAST(l_quantity AS BIGINT) % 7) AS m7,
  round(sum((l_quantity * 2 + 3) % 5) * 100) / 100 AS m5,
  round(avg(-l_extendedprice) * 100) / 100 AS neg_avg,
  round(min(abs(l_discount - 0.05)) * 100) / 100 AS min_abs,
  sum(CAST(l_partkey AS INT) & 255) AS band,
  count(DISTINCT l_linenumber) AS dl
FROM lineitem GROUP BY l_returnflag
