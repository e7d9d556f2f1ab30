-- reference: ql/src/test/queries/clientpositive/union35.q (UNION ALL of
-- two constant-projection subqueries each over TABLESAMPLE(n ROWS) —
-- the column NAMES differ between branches and the union takes the
-- first branch's) + unionLimit.q (union followed by an outer limit).
SELECT * FROM (
  SELECT * FROM (SELECT 1 AS id, 'foo' AS str_1 FROM nation TABLESAMPLE (5 ROWS)) f
  UNION ALL
  SELECT * FROM (SELECT 2 AS id, 'bar' AS str_2 FROM nation TABLESAMPLE (5 ROWS)) g
) e
ORDER BY id, str_1 LIMIT 8;
