-- join_casesensitive.q shape: column and table references in mixed case —
-- HiveQL identifiers are case-insensitive.
DROP TABLE IF EXISTS g476_T;
CREATE TABLE g476_T (KeyCol INT, ValCol STRING);
INSERT INTO g476_t VALUES (1,'one'), (2,'two'), (5,'five');
SELECT A.KEYCOL AS k, a.valcol AS v, B.keycol AS k2
FROM g476_t A JOIN G476_T B ON a.KeyCol = B.KEYCOL
WHERE a.keyCol > 1
