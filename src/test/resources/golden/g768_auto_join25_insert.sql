-- auto_join25.q: FROM-first INSERT of a partition-pruned join, a
-- three-way join on an ARITHMETIC key (src1.key + src2.key = src3.key),
-- and a plain self-join — each hashed from its sink table.
DROP TABLE IF EXISTS g768_d1;
DROP TABLE IF EXISTS g768_d2;
CREATE TABLE g768_d1 (key INT, value STRING) STORED AS TEXTFILE;
CREATE TABLE g768_d2 (key INT, value STRING) STORED AS TEXTFILE;
FROM lineitem src1 JOIN orders src2 ON (src1.l_orderkey = src2.o_orderkey)
INSERT OVERWRITE TABLE g768_d1 SELECT src1.l_orderkey, src2.o_orderstatus
WHERE (src1.l_linenumber = 1 OR src1.l_linenumber = 2) AND (src2.o_orderpriority = '1-URGENT' OR src2.o_orderpriority = '2-HIGH');
FROM nation src1 JOIN nation src2 ON (src1.n_nationkey = src2.n_nationkey)
  JOIN nation src3 ON (src1.n_nationkey + src2.n_nationkey = src3.n_nationkey)
INSERT OVERWRITE TABLE g768_d2 SELECT src1.n_nationkey, src3.n_name;
SELECT 'd1' AS src, sum(hash(key)) AS hk, sum(hash(value)) AS hv, count(1) AS n FROM g768_d1
UNION ALL
SELECT 'd2' AS src, sum(hash(key)), sum(hash(value)), count(1) FROM g768_d2
