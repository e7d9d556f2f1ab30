-- join18_multi_distinct.q: FULL OUTER join of two GROUPED subqueries, the
-- right one computing TWO distinct aggregates over different columns —
-- unmatched group keys survive with NULL aggregate payloads.
DROP TABLE IF EXISTS g569_src;
DROP TABLE IF EXISTS g569_src1;
CREATE TABLE g569_src USING parquet AS
  SELECT CAST(n_nationkey % 6 AS STRING) AS key, concat('val_', n_nationkey % 3) AS value FROM nation;
CREATE TABLE g569_src1 USING parquet AS
  SELECT CAST(n_nationkey % 4 AS STRING) AS key, concat('val_', n_nationkey % 2) AS value
  FROM nation WHERE n_nationkey < 12;
SELECT a.key AS ak, CAST(a.value AS STRING) AS av,
       b.key AS bk, CAST(b.value1 AS STRING) AS bv1, CAST(b.value2 AS STRING) AS bv2
FROM
 (SELECT src1.key AS key, count(src1.value) AS value FROM g569_src src1 GROUP BY src1.key) a
FULL OUTER JOIN
 (SELECT src2.key AS key, count(DISTINCT src2.value) AS value1,
         count(DISTINCT src2.key) AS value2
  FROM g569_src1 src2 GROUP BY src2.key) b
ON (a.key = b.key)
