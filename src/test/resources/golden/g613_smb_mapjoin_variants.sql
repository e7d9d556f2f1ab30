-- smb_mapjoin_2.q/smb_mapjoin_7.q representatives: sort-merge-bucket
-- joins over bucketed+sorted tables — inner and full outer with
-- mismatched keys; bucket layout must not change answers.
DROP TABLE IF EXISTS g613_a;
DROP TABLE IF EXISTS g613_b;
CREATE TABLE g613_a (k INT, v STRING) USING parquet
  CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g613_b (k INT, w STRING) USING parquet
  CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT INTO g613_a SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 2 = 0;
INSERT INTO g613_b SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 = 0;
SELECT 'inner' AS tag, COUNT(*) AS n, SUM(a.k) AS sk
FROM g613_a a JOIN g613_b b ON a.k = b.k
UNION ALL
SELECT 'full', COUNT(*), SUM(COALESCE(a.k, b.k))
FROM g613_a a FULL OUTER JOIN g613_b b ON a.k = b.k
