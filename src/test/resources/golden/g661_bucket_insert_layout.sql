-- bucket2.q, bucket3.q, bucket4.q, disable_merge_for_bucketing.q,
-- bucketsortoptimize_insert_4.q, bucketsortoptimize_insert_6.q,
-- bucketsortoptimize_insert_7.q, bucketsortoptimize_insert_8.q:
-- bucketed+sorted INSERT layout — table-to-table insert between
-- co-bucketed tables preserves join-ability and answers; reading a
-- single bucket via TABLESAMPLE hits the Hive hash.
DROP TABLE IF EXISTS g661_src;
DROP TABLE IF EXISTS g661_dst;
CREATE TABLE g661_src (k INT, v STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g661_dst (k INT, v STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT INTO g661_src SELECT n_nationkey, n_name FROM nation;
INSERT OVERWRITE TABLE g661_dst SELECT k, v FROM g661_src;
SELECT 'roundtrip' AS tag, COUNT(*) AS n, SUM(k) AS s FROM g661_dst
UNION ALL
SELECT 'bucket1_sample', COUNT(*), SUM(k) FROM g661_dst TABLESAMPLE (BUCKET 1 OUT OF 4 ON k)
UNION ALL
SELECT 'joinable', COUNT(*), SUM(a.k) FROM g661_src a JOIN g661_dst b ON a.k = b.k
