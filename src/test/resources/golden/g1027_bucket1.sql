-- reference: ql/src/test/queries/clientpositive/bucket1.q — INSERT
-- OVERWRITE into a CLUSTERED BY table under enforced bucketing, then a
-- full read back: every row lands in its hash bucket and nothing is
-- lost or duplicated across the bucket files.
DROP TABLE IF EXISTS g1027_b;
CREATE TABLE g1027_b (key INT, value STRING) USING parquet CLUSTERED BY (key) INTO 8 BUCKETS;
INSERT OVERWRITE TABLE g1027_b SELECT n_nationkey, n_name FROM nation;
SELECT * FROM g1027_b;
