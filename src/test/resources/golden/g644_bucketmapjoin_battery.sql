-- bucketmapjoin1.q..bucketmapjoin5.q + bucket_map_join_spark1.q..4.q +
-- bucket_map_join_tez1.q/2.q: bucket-map-join over co-bucketed tables
-- where only the small side is hinted; differing bucket counts (2 vs 4,
-- a divisor pair) still join correctly.
DROP TABLE IF EXISTS g644_big;
DROP TABLE IF EXISTS g644_small;
CREATE TABLE g644_big (k INT, v STRING) USING parquet CLUSTERED BY (k) INTO 4 BUCKETS;
CREATE TABLE g644_small (k INT, w STRING) USING parquet CLUSTERED BY (k) INTO 2 BUCKETS;
INSERT INTO g644_big SELECT n_nationkey, n_name FROM nation;
INSERT INTO g644_small SELECT r_regionkey, r_name FROM region;
SELECT /*+ MAPJOIN(s) */ s.w AS region_name, COUNT(*) AS n
FROM g644_big b JOIN g644_small s ON b.k % 5 = s.k
GROUP BY s.w
