-- bucketmapjoin2.q, bucketmapjoin3.q, bucketmapjoin4.q,
-- bucketmapjoin7.q, bucketmapjoin8.q, bucketmapjoin9.q,
-- bucketmapjoin10.q, bucketmapjoin11.q, bucketmapjoin12.q,
-- bucketmapjoin13.q, bucketmapjoin_negative.q,
-- bucketmapjoin_negative2.q, bucketmapjoin_negative3.q,
-- bucket_map_join_1.q, bucket_map_join_2.q, bucket_map_join_spark2.q,
-- bucket_map_join_spark3.q, bucket_map_join_spark4.q,
-- bucket_map_join_tez2.q: bucketed join matrix — same/divisor/
-- NON-divisor (negative: falls back, same answers) bucket counts,
-- hinted and unhinted.
DROP TABLE IF EXISTS g660_x;
DROP TABLE IF EXISTS g660_y;
DROP TABLE IF EXISTS g660_z;
CREATE TABLE g660_x (k INT, v STRING) USING parquet CLUSTERED BY (k) INTO 4 BUCKETS;
CREATE TABLE g660_y (k INT, v STRING) USING parquet CLUSTERED BY (k) INTO 4 BUCKETS;
CREATE TABLE g660_z (k INT, v STRING) USING parquet CLUSTERED BY (k) INTO 3 BUCKETS;
INSERT INTO g660_x SELECT n_nationkey, n_name FROM nation;
INSERT INTO g660_y SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 18;
INSERT INTO g660_z SELECT n_nationkey, n_name FROM nation WHERE n_nationkey > 6;
SELECT 'same_buckets' AS tag, COUNT(*) AS n FROM g660_x a JOIN g660_y b ON a.k = b.k
UNION ALL
SELECT 'nondivisor_negative', COUNT(*) FROM g660_x a JOIN g660_z b ON a.k = b.k
UNION ALL
SELECT /*+ MAPJOIN(b) */ 'hinted', COUNT(*) FROM g660_x a JOIN g660_y b ON a.k = b.k
