-- join_literals.q: typed numeric literal suffixes (L bigint, S smallint,
-- Y tinyint, BD decimal) as extra equi-join conjuncts — each variant must
-- parse, coerce against the INT key, and keep the join an equi-join.
DROP TABLE IF EXISTS g533_src;
CREATE TABLE g533_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
SELECT 'bigint' AS v, COUNT(*) AS c
FROM g533_src a JOIN g533_src b ON a.key = b.key AND a.key = 3L
UNION ALL
SELECT 'smallint', COUNT(*)
FROM g533_src a JOIN g533_src b ON a.key = b.key AND a.key = 3S
UNION ALL
SELECT 'tinyint', COUNT(*)
FROM g533_src a JOIN g533_src b ON a.key = b.key AND a.key = 3Y
UNION ALL
SELECT 'decimal', COUNT(*)
FROM g533_src a JOIN g533_src b ON a.key = b.key AND a.key = 3BD
UNION ALL
SELECT 'no_match', COUNT(*)
FROM g533_src a JOIN g533_src b ON a.key = b.key AND a.key = 99L
