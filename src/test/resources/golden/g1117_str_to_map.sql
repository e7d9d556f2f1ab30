-- reference: ql/src/test/queries/clientpositive/str_to_map.q —
-- str_to_map with explicit delimiters, default delimiters, map access,
-- and the table-sourced form with '_'/'=' delimiters.
DROP TABLE IF EXISTS g1117_s2m;
CREATE TABLE g1117_s2m AS
  SELECT 'ABC=CC_333=444' AS t FROM nation TABLESAMPLE (3 ROWS);
SELECT
  str_to_map('a=1,b=2,c=3', ',', '=')['a'] AS a_eq,
  str_to_map('a:1,b:2,c:3')['b'] AS b_default,
  CAST(str_to_map('a:1,b:2,c:3', ',', ':') AS STRING) AS whole,
  (SELECT min(str_to_map(t, '_', '=')['333']) FROM g1117_s2m) AS tbl_333
FROM nation TABLESAMPLE (1 ROWS)
