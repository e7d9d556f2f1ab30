-- reference: ql/src/test/queries/clientnegative/exim_20_managed_location_over_existing.q
-- A managed IMPORT with an explicit LOCATION may not redirect an
-- existing table's storage (ImportSemanticAnalyzer checkTable).
-- ERROR-CONTAINS: Location does not match
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_exim20;
DROP TABLE IF EXISTS graft_tmp.neg_exim20_i;
CREATE TABLE graft_tmp.neg_exim20 (dep_id INT) USING parquet;
INSERT INTO graft_tmp.neg_exim20 VALUES (1);
EXPORT TABLE graft_tmp.neg_exim20 TO '${NEGTMP}/exp20';
CREATE TABLE graft_tmp.neg_exim20_i (dep_id INT) USING parquet;
IMPORT TABLE graft_tmp.neg_exim20_i FROM '${NEGTMP}/exp20' LOCATION '${NEGTMP}/elsewhere';
