-- reference: ql/src/test/queries/clientpositive/ct_case_insensitive.q —
-- CLUSTERED BY / SORTED BY resolve the bucketing columns
-- case-insensitively (userId vs userid vs USERID).
DROP TABLE IF EXISTS g1097_b;
CREATE TABLE g1097_b (userId INT)
  CLUSTERED BY (userid) SORTED BY (USERID) INTO 4 BUCKETS
  STORED AS PARQUET;
INSERT INTO g1097_b SELECT CAST(n_nationkey AS INT) FROM nation;
SELECT count(*) AS n, sum(userid) AS s, min(USERID) AS mn FROM g1097_b
