-- vector_varchar_simple.q: varchar columns behave as bounded strings —
-- ordering/limit match the string source, int implicitly converts on
-- insert, and no pad ever appears (varchar never blank-pads).
DROP TABLE IF EXISTS g883_vc;
CREATE TABLE g883_vc (key VARCHAR(10), value VARCHAR(30)) USING parquet;
INSERT OVERWRITE TABLE g883_vc SELECT n_name, concat('nation ', n_name) FROM nation;
SELECT key, length(key) AS klen, value
FROM g883_vc ORDER BY key DESC LIMIT 5
