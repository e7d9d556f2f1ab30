-- reference: ql/src/test/queries/clientnegative/exim_01_nonpart_over_loaded.q
-- IMPORT into an existing NON-PARTITIONED table that already contains
-- data files refuses — the append would double a re-run script's rows
-- ERROR-CONTAINS: contains data files
DROP TABLE IF EXISTS neg_exim_loaded_src;
DROP TABLE IF EXISTS neg_exim_loaded_dst;
CREATE TABLE neg_exim_loaded_src (dep_id INT) USING PARQUET;
INSERT INTO neg_exim_loaded_src VALUES (1), (2);
EXPORT TABLE neg_exim_loaded_src TO '${NEGTMP}/exp_loaded';
CREATE TABLE neg_exim_loaded_dst (dep_id INT) USING PARQUET;
INSERT INTO neg_exim_loaded_dst VALUES (9);
IMPORT TABLE neg_exim_loaded_dst FROM '${NEGTMP}/exp_loaded';
