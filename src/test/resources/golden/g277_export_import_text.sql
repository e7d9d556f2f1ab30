-- EXPORT TABLE ... TO / IMPORT TABLE ... FROM statement text
DROP TABLE IF EXISTS g277_src;
DROP TABLE IF EXISTS g277_dst;
CREATE TABLE g277_src (k INT, nm STRING) USING parquet;
INSERT OVERWRITE TABLE g277_src SELECT n_nationkey, n_name FROM nation;
EXPORT TABLE g277_src TO '/tmp/graft_g277_exp';
IMPORT TABLE g277_dst FROM '/tmp/graft_g277_exp';
SELECT k, nm FROM g277_dst
