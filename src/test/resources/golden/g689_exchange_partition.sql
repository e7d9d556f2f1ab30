-- exchange_partition.q / exchange_partition2.q / exchange_partition3.q:
-- ALTER TABLE dest EXCHANGE PARTITION (spec) WITH TABLE src moves the
-- matching partitions (partial specs move the whole subtree) — the
-- metastore exchange_partition contract, DDLTask.java:4270. The final
-- SELECT pins: dest holds the moved rows + its own, src keeps only the
-- unmatched partition, and the per-table partition listings agree.
DROP TABLE IF EXISTS g689_dst;
DROP TABLE IF EXISTS g689_src;
CREATE TABLE g689_dst (f1 STRING) PARTITIONED BY (ds STRING, hr STRING);
CREATE TABLE g689_src (f1 STRING) PARTITIONED BY (ds STRING, hr STRING);
INSERT INTO g689_dst PARTITION (ds='2014-01-03', hr='1') VALUES ('mine');
INSERT INTO g689_src PARTITION (ds='2013-04-05', hr='1') VALUES ('a1'), ('a2');
INSERT INTO g689_src PARTITION (ds='2013-04-05', hr='2') VALUES ('b1');
INSERT INTO g689_src PARTITION (ds='2014-09-09', hr='1') VALUES ('stay');
ALTER TABLE g689_dst EXCHANGE PARTITION (ds='2013-04-05') WITH TABLE g689_src;
SELECT 'dst' AS side, f1, ds, hr FROM g689_dst
UNION ALL
SELECT 'src' AS side, f1, ds, hr FROM g689_src
ORDER BY side, ds, hr, f1
