-- vector_left_outer_join.q, vector_mapjoin_reduce.q, vector_groupby_3.q,
-- vector_orderby_5.q, vector_string_concat.q, vector_char_4.q,
-- vector_varchar_4.q, vector_decimal_mapjoin.q, vectorized_mapjoin.q,
-- vectorized_nested_mapjoin.q, vectorized_shufflejoin.q: vectorized
-- join + groupby + orderby combos, char/varchar padding, string concat
-- over join output, decimal join keys.
SELECT 'louter_agg' AS tag, COUNT(*) AS n, SUM(COALESCE(b.r_regionkey, -1)) AS s
FROM nation a LEFT OUTER JOIN region b ON a.n_regionkey = b.r_regionkey AND b.r_regionkey < 3
UNION ALL
SELECT 'nested_mapjoin', COUNT(*), SUM(c.r_regionkey)
FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
  JOIN region c ON a.n_regionkey = c.r_regionkey
UNION ALL
SELECT 'concat_over_join', COUNT(DISTINCT CONCAT(a.n_name, '|', b.r_name)), 0
FROM nation a JOIN region b ON a.n_regionkey = b.r_regionkey
UNION ALL
SELECT 'char_pad', COUNT(*), 0 FROM
  (SELECT CAST(n_name AS CHAR(20)) AS c, CAST(n_name AS VARCHAR(8)) AS v FROM nation) t
  WHERE LENGTH(v) <= 8
UNION ALL
SELECT 'decimal_key_join', COUNT(*), 0 FROM
  (SELECT CAST(n_regionkey AS DECIMAL(5,1)) AS dk FROM nation) a
  JOIN (SELECT CAST(r_regionkey AS DECIMAL(5,1)) AS dk FROM region) b ON a.dk = b.dk
