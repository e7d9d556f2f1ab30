-- join_reorder4.q: the STREAMTABLE hint naming EACH leg of a three-way
-- join in turn — the hint reorders build/stream sides only; all three
-- variants must produce identical rows.
DROP TABLE IF EXISTS g576_t1;
DROP TABLE IF EXISTS g576_t2;
DROP TABLE IF EXISTS g576_t3;
CREATE TABLE g576_t1 USING parquet AS
  SELECT CAST(n_nationkey % 5 AS STRING) AS key1, concat('v1_', n_nationkey) AS val1
  FROM nation WHERE n_nationkey < 10;
CREATE TABLE g576_t2 USING parquet AS
  SELECT CAST(n_nationkey % 4 AS STRING) AS key2, concat('v2_', n_nationkey) AS val2
  FROM nation WHERE n_nationkey < 8;
CREATE TABLE g576_t3 USING parquet AS
  SELECT CAST(n_nationkey % 3 AS STRING) AS key3, concat('v3_', n_nationkey) AS val3
  FROM nation WHERE n_nationkey < 6;
SELECT 'sa' AS tag, x.key1, x.val2, x.val3
FROM (SELECT /*+ STREAMTABLE(a) */ a.key1, b.val2, c.val3
      FROM g576_t1 a JOIN g576_t2 b ON a.key1 = b.key2
      JOIN g576_t3 c ON a.key1 = c.key3) x
UNION ALL
SELECT 'sb', x.key1, x.val2, x.val3
FROM (SELECT /*+ STREAMTABLE(b) */ a.key1, b.val2, c.val3
      FROM g576_t1 a JOIN g576_t2 b ON a.key1 = b.key2
      JOIN g576_t3 c ON a.key1 = c.key3) x
UNION ALL
SELECT 'sc', x.key1, x.val2, x.val3
FROM (SELECT /*+ STREAMTABLE(c) */ a.key1, b.val2, c.val3
      FROM g576_t1 a JOIN g576_t2 b ON a.key1 = b.key2
      JOIN g576_t3 c ON a.key1 = c.key3) x
