-- auto_sortmerge_join_1.q, auto_sortmerge_join_2.q,
-- auto_sortmerge_join_3.q, auto_sortmerge_join_4.q,
-- auto_sortmerge_join_5.q, auto_sortmerge_join_6.q,
-- auto_sortmerge_join_7.q, auto_sortmerge_join_8.q,
-- auto_sortmerge_join_9.q, auto_sortmerge_join_10.q,
-- auto_sortmerge_join_12.q, auto_sortmerge_join_13.q,
-- auto_sortmerge_join_14.q (battery): the
-- auto-triggered SMB conversion across big/small table order, with a
-- partitioned probe side and an empty small table edge (asj_12's
-- no-match bucket).
DROP TABLE IF EXISTS g645_big;
DROP TABLE IF EXISTS g645_small;
DROP TABLE IF EXISTS g645_empty;
CREATE TABLE g645_big (k INT, q INT) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g645_small (k INT, w STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
CREATE TABLE g645_empty (k INT, w STRING) USING parquet CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS;
INSERT INTO g645_big SELECT CAST(l_orderkey % 30 AS INT), CAST(l_quantity AS INT) FROM lineitem WHERE l_orderkey < 1000;
INSERT INTO g645_small SELECT n_nationkey, n_name FROM nation;
SELECT 'big_small' AS tag, COUNT(*) AS n, SUM(b.q) AS s
FROM g645_big b JOIN g645_small s ON b.k = s.k
UNION ALL
SELECT 'small_big', COUNT(*), SUM(b.q)
FROM g645_small s JOIN g645_big b ON s.k = b.k
UNION ALL
SELECT 'vs_empty', COUNT(*), COALESCE(SUM(b.q), -1)
FROM g645_big b JOIN g645_empty e ON b.k = e.k
UNION ALL
SELECT 'louter_empty', COUNT(*), SUM(b.q)
FROM g645_big b LEFT OUTER JOIN g645_empty e ON b.k = e.k
