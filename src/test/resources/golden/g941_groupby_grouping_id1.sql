-- groupby_grouping_id1.q: GROUPING__ID under WITH CUBE / WITH ROLLUP —
-- position in the select list doesn't matter, and the id is CASE-able
-- like any int. Values follow the POST-HIVE-16102 standard semantics
-- the engine documents (leftmost key = MSB, bit set = key AGGREGATED:
-- 0=both keys present, 3=grand total) — the 1.2-era reference's legacy
-- encoding inverts exactly those two extremes (its .q.out has grand
-- total=0); the engine sides with the fixed semantics, as Spark and
-- DuckDB do (rewriteVirtualColumns scaladoc). All three of the stem's
-- probes union into the one pinned result.
DROP TABLE IF EXISTS g941_t1;
CREATE TABLE g941_t1 USING parquet AS
  SELECT CAST(n_regionkey AS STRING) AS key,
         CAST(n_nationkey % 3 AS STRING) AS val
  FROM nation WHERE n_nationkey < 8;
SELECT 'cube' AS probe, key, val, GROUPING__ID AS gid, NULL AS tag
  FROM g941_t1 GROUP BY key, val WITH CUBE
UNION ALL
SELECT 'rollup' AS probe, key, val, GROUPING__ID AS gid, NULL AS tag
  FROM g941_t1 GROUP BY key, val WITH ROLLUP
UNION ALL
SELECT 'case' AS probe, key, val, GROUPING__ID AS gid,
       CASE WHEN GROUPING__ID == 0 THEN "0" WHEN GROUPING__ID == 1 THEN "1"
            WHEN GROUPING__ID == 2 THEN "2" WHEN GROUPING__ID == 3 THEN "3"
            ELSE "nothing" END AS tag
  FROM g941_t1 GROUP BY key, val WITH CUBE
