-- reference: ExportSemanticAnalyzer getPartitions EMPTY-match refusal;
-- the quoted value contains a comma and MUST parse as ONE key=value
-- pair (the r15 advisor's parseSpec hazard) — the error names the whole
-- value, proving it wasn't split into two bogus pairs.
-- ERROR-CONTAINS: no partition of
DROP TABLE IF EXISTS neg_exim_comma;
CREATE TABLE neg_exim_comma (i INT) USING parquet PARTITIONED BY (p STRING);
INSERT INTO neg_exim_comma PARTITION (p='other') VALUES (1);
EXPORT TABLE neg_exim_comma PARTITION (p='a,b') TO '${NEGTMP}/expc';
