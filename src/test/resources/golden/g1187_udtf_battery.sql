-- reference: ql/src/test/queries/clientpositive/udf_explode.q +
-- udtf_posexplode.q + udtf_json_tuple.q + udtf_parse_url_tuple.q —
-- the generator battery: explode over array and map, posexplode,
-- json_tuple, and parse_url_tuple via LATERAL VIEW.
SELECT 'explode_arr' AS tag, CAST(c1 AS STRING) AS a, CAST(NULL AS STRING) AS b
FROM nation TABLESAMPLE (1 ROWS)
LATERAL VIEW explode(array(1, 2, 3)) t AS c1
UNION ALL
SELECT 'explode_map', k, v
FROM nation TABLESAMPLE (1 ROWS)
LATERAL VIEW explode(map(1, 'one', 2, 'two')) t AS k, v
UNION ALL
SELECT 'posexplode', CAST(pos AS STRING), val
FROM nation TABLESAMPLE (1 ROWS)
LATERAL VIEW posexplode(array('a', 'b', 'c')) t AS pos, val
UNION ALL
SELECT 'json_tuple', j1, j2
FROM nation TABLESAMPLE (1 ROWS)
LATERAL VIEW json_tuple('{"f1":"v1","f2":4}', 'f1', 'f2') t AS j1, j2
UNION ALL
SELECT 'parse_url', host, qk
FROM nation TABLESAMPLE (1 ROWS)
LATERAL VIEW parse_url_tuple('http://example.com:8080/p?k=u', 'HOST', 'QUERY:k')
  t AS host, qk
