-- smb_mapjoin_3.q, smb_mapjoin_4.q, smb_mapjoin_5.q, smb_mapjoin_10.q,
-- smb_mapjoin_11.q, smb_mapjoin_12.q, smb_mapjoin_13.q,
-- smb_mapjoin_14.q, smb_mapjoin_15.q, smb_mapjoin_16.q,
-- smb_mapjoin_17.q, smb_mapjoin_18.q, smb_mapjoin_19.q, smb_mapjoin_21.q,
-- smb_mapjoin_22.q, smb_mapjoin_25.q: three-way SMB chains, join on a
-- partitioned bucketed table, and the bucket-count-mismatch pair that
-- still answers correctly.
DROP TABLE IF EXISTS g658_a;
DROP TABLE IF EXISTS g658_b;
DROP TABLE IF EXISTS g658_c;
CREATE TABLE g658_a (k INT, v INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 2 BUCKETS;
CREATE TABLE g658_b (k INT, v INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g658_c (k INT, v INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 8 BUCKETS;
INSERT INTO g658_a SELECT n_nationkey, n_regionkey FROM nation;
INSERT INTO g658_b SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 2 = 0;
INSERT INTO g658_c SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 3 = 0;
SELECT 'three_way' AS tag, COUNT(*) AS n, SUM(a.k) AS s
FROM g658_a a JOIN g658_b b ON a.k = b.k JOIN g658_c c ON b.k = c.k
UNION ALL
SELECT 'mismatch_buckets', COUNT(*), SUM(b.k)
FROM g658_b b JOIN g658_c c ON b.k = c.k
UNION ALL
SELECT 'outer_three', COUNT(*), SUM(COALESCE(c.k, -1))
FROM g658_a a LEFT OUTER JOIN g658_b b ON a.k = b.k
  LEFT OUTER JOIN g658_c c ON a.k = c.k
