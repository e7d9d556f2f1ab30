-- join_cond_pushdown_unqual1.q: separate part2/part3 tables (legacy DDL),
-- unqualified column references across the 3-way join
DROP TABLE IF EXISTS g245_part2;
DROP TABLE IF EXISTS g245_part3;
CREATE TABLE g245_part2 (p2_partkey BIGINT, p2_name STRING, p2_size INT)
ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' STORED AS TEXTFILE;
CREATE TABLE g245_part3 (p3_partkey BIGINT, p3_name STRING, p3_size INT)
STORED AS PARQUET;
INSERT OVERWRITE TABLE g245_part2 SELECT p_partkey, p_name, p_size FROM part;
INSERT OVERWRITE TABLE g245_part3 SELECT p_partkey, p_name, p_size FROM part;
SELECT count(*) AS n, sum(p2_size) AS s2
FROM part p1 JOIN g245_part2 p2 JOIN g245_part3 p3
ON p1.p_name = p2_name AND p2_name = p3_name
