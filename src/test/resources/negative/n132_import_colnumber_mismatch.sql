-- reference: ql/src/test/queries/clientnegative/exim_04_nonpart_noncompat_colnumber.q
-- IMPORT into an existing table with a different column count
-- ERROR-CONTAINS: column schema does not match
DROP TABLE IF EXISTS neg_exim_src4;
DROP TABLE IF EXISTS neg_exim_dst4;
CREATE TABLE neg_exim_src4 (dep_id INT) USING PARQUET;
INSERT INTO neg_exim_src4 VALUES (1);
EXPORT TABLE neg_exim_src4 TO '${NEGTMP}/exp4';
CREATE TABLE neg_exim_dst4 (dep_id INT, dep_name STRING) USING PARQUET;
IMPORT TABLE neg_exim_dst4 FROM '${NEGTMP}/exp4';
