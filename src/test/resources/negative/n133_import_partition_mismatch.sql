-- reference: ql/src/test/queries/clientnegative/exim_07_nonpart_noncompat_ifof.q
-- (partitioning-compat family): IMPORT of an unpartitioned export into
-- an existing PARTITIONED table
-- ERROR-CONTAINS: partition columns do not match
DROP TABLE IF EXISTS neg_exim_src5;
DROP TABLE IF EXISTS neg_exim_dst5;
CREATE TABLE neg_exim_src5 (dep_id INT) USING PARQUET;
INSERT INTO neg_exim_src5 VALUES (1);
EXPORT TABLE neg_exim_src5 TO '${NEGTMP}/exp5';
CREATE TABLE neg_exim_dst5 (dep_id INT, dt STRING) USING PARQUET PARTITIONED BY (dt);
IMPORT TABLE neg_exim_dst5 FROM '${NEGTMP}/exp5';
