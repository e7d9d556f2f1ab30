-- load_dyn_part1.q: two-level dynamic partition INSERT (ds, hr both
-- dynamic, nonstrict), then per-partition counts.
DROP TABLE IF EXISTS g597_t;
CREATE TABLE g597_t (k INT, v STRING) USING parquet PARTITIONED BY (ds STRING, hr INT);
INSERT OVERWRITE TABLE g597_t PARTITION (ds, hr)
  SELECT n_nationkey, n_name,
         CASE WHEN n_nationkey < 13 THEN 'd1' ELSE 'd2' END,
         CAST(n_regionkey AS INT)
  FROM nation;
SELECT ds, hr, COUNT(*) AS n FROM g597_t GROUP BY ds, hr
