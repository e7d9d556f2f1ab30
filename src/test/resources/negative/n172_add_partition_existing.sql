-- reference: ql/src/test/queries/clientnegative/addpart1.q
-- ADD PARTITION of a spec that already exists
-- ERROR-CONTAINS: PARTITIONS_ALREADY_EXIST | already exist
DROP TABLE IF EXISTS neg_ape;
CREATE TABLE neg_ape (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_ape VALUES ('a', '1');
ALTER TABLE neg_ape ADD PARTITION (dt='1');
