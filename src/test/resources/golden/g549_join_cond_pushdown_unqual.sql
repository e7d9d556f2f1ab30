-- join_cond_pushdown_unqual2.q: join conditions referencing UNQUALIFIED
-- column names that are unique across the joined tables (p_name vs
-- p2_name vs p3_name) — resolution must find each name's table, and
-- non-key conjuncts (p_size constants) must push to their scans.
DROP TABLE IF EXISTS g549_p2;
DROP TABLE IF EXISTS g549_p3;
CREATE TABLE g549_p2 USING parquet AS
  SELECT p_partkey AS p2_partkey, p_name AS p2_name, p_size AS p2_size
  FROM part;
CREATE TABLE g549_p3 USING parquet AS
  SELECT p_partkey AS p3_partkey, p_name AS p3_name, p_size AS p3_size
  FROM part;
SELECT p_partkey AS k, p2_partkey AS k2, p3_partkey AS k3
FROM part p1 JOIN g549_p2 p2 ON p_name = p2_name
JOIN g549_p3 p3 ON p2_name = p3_name AND p_size = p3_size AND p_size < 10
WHERE p_partkey <= 60
