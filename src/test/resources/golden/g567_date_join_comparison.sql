-- date_join1.q / date_comparison.q: DATE as a join key and the date
-- comparison/arithmetic surface (datediff, date +/- interval, cast from
-- string with and without time).
DROP TABLE IF EXISTS g567_o;
CREATE TABLE g567_o USING parquet AS
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders WHERE o_orderkey <= 100;
SELECT 'self_join' AS tag, CAST(count(*) AS STRING) AS a, '' AS b
FROM g567_o x JOIN g567_o y ON x.d = y.d AND x.o_orderkey < y.o_orderkey
UNION ALL
SELECT 'cmp',
  CAST(CAST('2011-05-06' AS DATE) < CAST('2011-05-07' AS DATE) AS STRING),
  CAST(CAST('2011-05-06' AS DATE) = CAST('2011-05-06 10:00:00' AS DATE) AS STRING)
UNION ALL
SELECT 'arith',
  CAST(datediff('2011-05-06', '2011-04-06') AS STRING),
  CAST(date_add(CAST('2011-05-06' AS DATE), 31) AS STRING)
UNION ALL
SELECT 'minmax', CAST(min(d) AS STRING), CAST(max(d) AS STRING) FROM g567_o
