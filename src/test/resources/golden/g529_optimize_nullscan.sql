-- optimize_nullscan.q: always-false predicates, limit-0 subqueries, and
-- false-filtered unions/joins must produce EMPTY results with valid
-- schemas (the reference replaces such scans with null scans — the
-- Catalyst analog is PropagateEmptyRelation). Only the grouped-count
-- variant contributes rows: count over an empty side is 0.
DROP TABLE IF EXISTS g529_src;
DROP TABLE IF EXISTS g529_srcpart;
CREATE TABLE g529_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, concat('val_', n_nationkey) AS value
  FROM nation;
CREATE TABLE g529_srcpart (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g529_srcpart PARTITION (ds='2008-04-08')
  SELECT key, value FROM g529_src WHERE key < 10;
SELECT 'false_scan' AS v, CAST(key AS BIGINT) AS c1, CAST(NULL AS BIGINT) AS c2
  FROM g529_src WHERE false
UNION ALL
SELECT 'false_group', CAST(key AS BIGINT), count(key)
  FROM g529_srcpart WHERE 1 = 2 GROUP BY key
UNION ALL
SELECT 'false_left_limit0', CAST(a.key AS BIGINT), CAST(b.key AS BIGINT)
  FROM (SELECT key FROM g529_src WHERE false) a
  LEFT OUTER JOIN (SELECT key FROM g529_srcpart LIMIT 0) b ON a.key = b.key
UNION ALL
SELECT 'count_union', CAST(NULL AS BIGINT), n FROM (
  SELECT count(key) AS n FROM g529_src WHERE false
  UNION ALL
  SELECT count(key) FROM g529_srcpart) u
UNION ALL
SELECT 'false_over_union_join', CAST(k AS BIGINT), CAST(NULL AS BIGINT) FROM (
  SELECT key AS k FROM g529_src
  UNION ALL
  SELECT s.key FROM g529_src s LEFT OUTER JOIN g529_srcpart p ON s.key = p.key
) a WHERE false
UNION ALL
SELECT 'false_cartesian', CAST(s1.key AS BIGINT), CAST(s2.key AS BIGINT)
  FROM g529_src s1, g529_src s2 WHERE false AND s1.value = s2.value
