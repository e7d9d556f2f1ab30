-- reference: ql/src/test/queries/clientnegative/dyn_part1.q
-- (spec-validation leg): a static PARTITION spec naming a data column
-- ERROR-CONTAINS: PARTITIONS_NOT_FOUND | cannot be found
DROP TABLE IF EXISTS neg_isnp;
CREATE TABLE neg_isnp (k STRING, dt STRING) USING PARQUET PARTITIONED BY (dt);
INSERT INTO neg_isnp PARTITION (k='x') SELECT 'v', '2';
