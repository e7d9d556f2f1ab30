-- smb_mapjoin_9.q, smb_mapjoin_10.q, smb_mapjoin_11.q,
-- smb_mapjoin_12.q, smb_mapjoin_13.q, smb_mapjoin_14.q,
-- smb_mapjoin_15.q, smb_mapjoin_16.q, smb_mapjoin_17.q,
-- smb_mapjoin_18.q, smb_mapjoin_19.q, smb_mapjoin_20.q: SMB joins under aggregates, with
-- a filtered probe side and a join-then-group-by (the shapes the later
-- files vary).
DROP TABLE IF EXISTS g642_a;
DROP TABLE IF EXISTS g642_b;
CREATE TABLE g642_a (k INT, r INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g642_b (k INT, r INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT INTO g642_a SELECT n_nationkey, n_regionkey FROM nation;
INSERT INTO g642_b SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey % 2 = 0;
SELECT a.r AS grp, COUNT(*) AS n, SUM(b.k) AS s
FROM g642_a a JOIN g642_b b ON a.k = b.k
WHERE a.k > 4
GROUP BY a.r
