-- reference: ql/src/test/queries/clientnegative/exim_03_nonpart_noncompat_colschema.q
-- IMPORT into an existing table whose column type differs
-- ERROR-CONTAINS: column schema does not match
DROP TABLE IF EXISTS neg_exim_src;
DROP TABLE IF EXISTS neg_exim_dst3;
CREATE TABLE neg_exim_src (dep_id INT) USING PARQUET;
INSERT INTO neg_exim_src VALUES (1), (2);
EXPORT TABLE neg_exim_src TO '${NEGTMP}/exp3';
CREATE TABLE neg_exim_dst3 (dep_id BIGINT) USING PARQUET;
IMPORT TABLE neg_exim_dst3 FROM '${NEGTMP}/exp3';
