-- vector_multi_insert.q: FROM-first multi-insert fanning one scan into
-- three destinations with different predicates; each destination holds
-- exactly its slice.
DROP TABLE IF EXISTS g909_src;
DROP TABLE IF EXISTS g909_a;
DROP TABLE IF EXISTS g909_b;
DROP TABLE IF EXISTS g909_c;
CREATE TABLE g909_src (rn INT) USING parquet;
INSERT INTO g909_src SELECT n_nationkey FROM nation;
CREATE TABLE g909_a (rn INT) USING parquet;
CREATE TABLE g909_b (rn INT) USING parquet;
CREATE TABLE g909_c (rn INT) USING parquet;
FROM g909_src
INSERT OVERWRITE TABLE g909_a SELECT rn WHERE rn % 3 = 0
INSERT OVERWRITE TABLE g909_b SELECT rn WHERE rn % 3 = 1
INSERT OVERWRITE TABLE g909_c SELECT rn WHERE rn % 3 = 2;
SELECT (SELECT count(*) FROM g909_a) AS a,
       (SELECT count(*) FROM g909_b) AS b,
       (SELECT count(*) FROM g909_c) AS c,
       (SELECT sum(rn) FROM g909_a) AS sum_a
