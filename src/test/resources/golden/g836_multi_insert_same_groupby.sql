-- groupby7_map_multi_single_reducer.q: a FROM-first multi-insert whose
-- TWO branches share the identical GROUP BY (single-reducer reuse in
-- the reference); both destinations must land the same rollup.
DROP TABLE IF EXISTS g836_d1;
DROP TABLE IF EXISTS g836_d2;
CREATE TABLE g836_d1 (key BIGINT, value DOUBLE) USING parquet;
CREATE TABLE g836_d2 (key BIGINT, value DOUBLE) USING parquet;
FROM orders
INSERT OVERWRITE TABLE g836_d1 SELECT o_custkey, sum(o_totalprice) GROUP BY o_custkey
INSERT OVERWRITE TABLE g836_d2 SELECT o_custkey, sum(o_totalprice) GROUP BY o_custkey;
SELECT count(*) AS n_match FROM g836_d1 a JOIN g836_d2 b
ON a.key = b.key AND a.value = b.value
