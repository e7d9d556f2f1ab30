-- reference: ql/src/test/queries/clientnegative/dyn_part1.q (FROM-first
-- multi-insert leg): the dynamic-partition guards must apply per branch
-- of the FROM-first form too, not just the INSERT-first statement shape
-- ERROR-CONTAINS: Dynamic partition is disabled
DROP TABLE IF EXISTS neg_mi_dyn;
DROP TABLE IF EXISTS neg_mi_plain;
CREATE TABLE neg_mi_dyn (n STRING, rk INT) USING PARQUET PARTITIONED BY (rk);
CREATE TABLE neg_mi_plain (n STRING) USING PARQUET;
SET hive.exec.dynamic.partition=false;
FROM nation
INSERT OVERWRITE TABLE neg_mi_dyn PARTITION (rk) SELECT n_name, n_regionkey
INSERT INTO neg_mi_plain SELECT n_name;
