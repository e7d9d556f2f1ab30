-- reference: ql/src/test/queries/clientpositive/query_with_semi.q +
-- regexp_extract.q — an ESCAPED semicolon inside a TRANSFORM string
-- literal must not split the statement, and regexp_extract over a
-- TRANSFORM output with CLUSTER BY.
SELECT 'semi' AS tag, t.a AS v1, CAST(NULL AS STRING) AS v2 FROM (
  FROM nation SELECT TRANSFORM('aa\;') USING 'cat' AS a LIMIT 1) t
UNION ALL
SELECT 'rex', tmap.tkey,
       regexp_extract(tmap.tvalue, 'NATION_(\\d+)', 1)
FROM (
  FROM nation
  SELECT TRANSFORM(nation.n_nationkey, nation.n_name, 1 + 2, 3 + 4)
  USING 'cat'
  CLUSTER BY key
) tmap (tkey, tvalue)
WHERE tmap.tkey < 5
