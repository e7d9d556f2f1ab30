-- join36.q / join37.q / join38.q / join39.q: MAPJOIN-hinted variants —
-- hinted small side, join through a projected wide table's LAST column
-- (join38's col11), and a post-join filter + group by.
DROP TABLE IF EXISTS g630_w;
CREATE TABLE g630_w USING parquet AS
  SELECT n_nationkey AS col0, n_nationkey + 5 AS col5, n_nationkey + 11 AS col11
  FROM nation WHERE n_nationkey = 1;
SELECT /*+ MAPJOIN(a) */ 'wide_last_col' AS tag, a.n_name AS v, COUNT(*) AS cnt
FROM nation a JOIN g630_w b ON (a.n_nationkey = b.col11)
WHERE b.col11 = 12
GROUP BY a.n_name
UNION ALL
SELECT /*+ MAPJOIN(b) */ 'hinted_small', r_name, COUNT(*)
FROM nation a JOIN region b ON (a.n_regionkey = b.r_regionkey)
GROUP BY r_name
