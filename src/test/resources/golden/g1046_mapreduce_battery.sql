-- reference: ql/src/test/queries/clientpositive/mapreduce3.q (MAP over
-- expressions with SORT BY after the output names) + mapreduce7.q
-- (src.* expansion ALONGSIDE explicit expressions in the MAP column
-- list) — FROM-first inserts whose body is the TRANSFORM sugar.
DROP TABLE IF EXISTS g1046_d1;
DROP TABLE IF EXISTS g1046_d2;
CREATE TABLE g1046_d1 (key INT, ten INT, one INT, value STRING) USING parquet;
CREATE TABLE g1046_d2 (k INT, v STRING, key INT, ten INT, one INT, value STRING) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g1046_d1
MAP nation.n_nationkey, CAST(nation.n_nationkey / 10 AS INT), CAST(nation.n_nationkey % 10 AS INT), nation.n_name
USING 'cat' AS (tkey, ten, one, tvalue)
SORT BY tvalue, tkey;
FROM (SELECT n_nationkey AS key, n_name AS value FROM nation) src
INSERT OVERWRITE TABLE g1046_d2
MAP src.*, src.key, CAST(src.key / 10 AS INT), CAST(src.key % 10 AS INT), src.value
USING 'cat' AS (k, v, tkey, ten, one, tvalue)
SORT BY tvalue, tkey;
SELECT 'd1' AS tag, count(*) AS n, sum(key) AS sk, sum(ten) AS st, sum(one) AS so FROM g1046_d1
UNION ALL
SELECT 'd2', count(*), sum(key), sum(ten), sum(one) FROM g1046_d2 WHERE k = key;
