-- reference: ql/src/test/queries/clientnegative/exim_19_external_over_existing.q
-- IMPORT EXTERNAL TABLE over an existing table is refused outright —
-- an external import re-points a location, it never merges into
-- managed storage (10120).
-- ERROR-CONTAINS: External table cannot overwrite existing table
DROP TABLE IF EXISTS neg_exim19;
DROP TABLE IF EXISTS neg_exim19_i;
CREATE TABLE neg_exim19 (dep_id INT) USING parquet;
INSERT INTO neg_exim19 VALUES (1), (2);
EXPORT TABLE neg_exim19 TO '${NEGTMP}/exp19';
CREATE TABLE neg_exim19_i (dep_id INT) USING parquet;
IMPORT EXTERNAL TABLE neg_exim19_i FROM '${NEGTMP}/exp19';
