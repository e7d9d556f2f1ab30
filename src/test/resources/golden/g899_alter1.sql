-- alter1.q: SET TBLPROPERTIES (add + overwrite, last wins), SET
-- SERDEPROPERTIES, and ADD COLUMNS — each observable through the
-- catalog afterwards; properties survive the column change.
DROP TABLE IF EXISTS g899_a1;
CREATE TABLE g899_a1 (a INT, b INT) USING parquet;
ALTER TABLE g899_a1 SET TBLPROPERTIES ('x'='1', 'y'='2');
ALTER TABLE g899_a1 SET TBLPROPERTIES ('x'='10');
ALTER TABLE g899_a1 SET SERDEPROPERTIES ('s1'='9');
ALTER TABLE g899_a1 ADD COLUMNS (c STRING);
INSERT INTO g899_a1 VALUES (1, 2, 'three');
SELECT a, b, c FROM g899_a1
