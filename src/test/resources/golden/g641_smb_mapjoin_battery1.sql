-- smb_mapjoin_1.q, smb_mapjoin_2.q, smb_mapjoin_3.q, smb_mapjoin_4.q,
-- smb_mapjoin_5.q, smb_mapjoin_6.q, smb_mapjoin_7.q, smb_mapjoin_8.q: sort-merge-bucket join battery over
-- co-bucketed sorted tables — inner, left, right, full, with one side
-- holding keys the other lacks (empty-bucket edge) and a small second
-- table.
DROP TABLE IF EXISTS g641_a;
DROP TABLE IF EXISTS g641_b;
CREATE TABLE g641_a (k INT, v STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 3 BUCKETS;
CREATE TABLE g641_b (k INT, w STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 3 BUCKETS;
INSERT INTO g641_a SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15;
INSERT INTO g641_b SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10;
SELECT 'inner' AS tag, COUNT(*) AS n, SUM(a.k) AS s FROM g641_a a JOIN g641_b b ON a.k = b.k
UNION ALL
SELECT 'left', COUNT(*), SUM(a.k) FROM g641_a a LEFT OUTER JOIN g641_b b ON a.k = b.k
UNION ALL
SELECT 'right', COUNT(*), SUM(b.k) FROM g641_a a RIGHT OUTER JOIN g641_b b ON a.k = b.k
UNION ALL
SELECT 'full', COUNT(*), SUM(COALESCE(a.k, b.k)) FROM g641_a a FULL OUTER JOIN g641_b b ON a.k = b.k
