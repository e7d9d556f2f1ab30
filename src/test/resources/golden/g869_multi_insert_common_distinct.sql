-- groupby8.q / groupby_mutli_insert_common_distinct.q: a FROM-first
-- multi-insert whose two branches compute the SAME count(DISTINCT)
-- over the same GROUP BY — the reference shares one distinct stage;
-- both destinations must agree exactly.
DROP TABLE IF EXISTS g869_d1;
DROP TABLE IF EXISTS g869_d2;
CREATE TABLE g869_d1 (key BIGINT, value BIGINT) USING parquet;
CREATE TABLE g869_d2 (key BIGINT, value BIGINT) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g869_d1
  SELECT o_custkey, count(DISTINCT substr(o_orderpriority, 1, 1)) GROUP BY o_custkey
INSERT OVERWRITE TABLE g869_d2
  SELECT o_custkey, count(DISTINCT substr(o_orderpriority, 1, 1)) GROUP BY o_custkey;
SELECT (SELECT count(*) FROM g869_d1) AS n1,
       (SELECT count(*) FROM g869_d2) AS n2,
       (SELECT count(*) FROM g869_d1 a JOIN g869_d2 b
        ON a.key = b.key AND a.value = b.value) AS n_match
