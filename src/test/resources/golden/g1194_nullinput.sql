-- reference: ql/src/test/queries/clientpositive/nullinput.q — selects
-- and a group-by over a table with ZERO rows: empty results, no
-- failures.
DROP TABLE IF EXISTS g1194_empty;
CREATE TABLE g1194_empty (a STRING, b STRING) USING parquet;
SELECT 'star' AS tag, CAST(count(*) AS INT) AS n FROM
  (SELECT x.* FROM g1194_empty x) s
UNION ALL
SELECT 'grouped', CAST(count(*) AS INT) FROM
  (SELECT x.a, count(1) FROM g1194_empty x GROUP BY x.a) g
