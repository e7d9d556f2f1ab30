-- multigroupby_singlemr.q: one FROM-first scan fanning into two inserts
-- with DIFFERENT group-by keys (the reference's single-MR multi-groupby
-- optimization; here one shared scan through Engine's multi-insert).
DROP TABLE IF EXISTS g316_a;
DROP TABLE IF EXISTS g316_b;
CREATE TABLE g316_a (k INT, cnt BIGINT) USING parquet;
CREATE TABLE g316_b (k INT, cnt BIGINT) USING parquet;
FROM nation
INSERT OVERWRITE TABLE g316_a SELECT n_regionkey, count(*) GROUP BY n_regionkey
INSERT OVERWRITE TABLE g316_b SELECT n_nationkey % 3, count(*) GROUP BY n_nationkey % 3;
SELECT 'a' AS src, k, cnt FROM g316_a
UNION ALL
SELECT 'b' AS src, k, cnt FROM g316_b;
