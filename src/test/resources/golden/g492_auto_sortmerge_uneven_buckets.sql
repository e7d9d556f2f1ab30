-- auto_sortmerge_join_1.q shape: bucketed+sorted tables with DIFFERENT
-- bucket counts (big 4 / small 2) joined unhinted — the auto SMB path;
-- rows are the contract whatever plan is picked.
DROP TABLE IF EXISTS g492_big;
DROP TABLE IF EXISTS g492_small;
CREATE TABLE g492_big (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 4 BUCKETS STORED AS PARQUET;
CREATE TABLE g492_small (key INT, value STRING) CLUSTERED BY (key) SORTED BY (key) INTO 2 BUCKETS STORED AS PARQUET;
INSERT INTO g492_big SELECT n_nationkey, n_name FROM nation;
INSERT INTO g492_small VALUES (0,'s0'), (5,'s5'), (10,'s10'), (23,'s23'), (40,'s40');
SELECT a.key AS k, a.value AS big_v, b.value AS small_v
FROM g492_big a JOIN g492_small b ON a.key = b.key
