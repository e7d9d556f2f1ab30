-- reference: ql/src/test/queries/clientpositive/rcfile_merge1.q +
-- rcfile_merge2.q + rcfile_merge3.q — RCFILE partitioned writes from
-- many map tasks, CONCATENATE on one partition, and an RCFile-to-text
-- comparison by aggregate signature (merge3's cross-format check).
DROP TABLE IF EXISTS g1063_rc;
DROP TABLE IF EXISTS g1063_txt;
CREATE TABLE g1063_rc (key INT, value STRING)
  PARTITIONED BY (ds STRING) STORED AS RCFILE;
CREATE TABLE g1063_txt (key INT, value STRING) STORED AS TEXTFILE;
INSERT OVERWRITE TABLE g1063_rc PARTITION (ds='1')
  SELECT n_nationkey, n_name FROM nation;
INSERT INTO g1063_rc PARTITION (ds='1')
  SELECT r_regionkey, r_name FROM region;
ALTER TABLE g1063_rc PARTITION (ds='1') CONCATENATE;
INSERT OVERWRITE TABLE g1063_txt SELECT key, value FROM g1063_rc WHERE ds='1';
SELECT 'rc' AS tag, count(*) AS n, sum(key) AS s,
       sum(hash(key, value) % 100000) AS sig FROM g1063_rc WHERE ds='1'
UNION ALL
SELECT 'txt', count(*), sum(key), sum(hash(key, value) % 100000) FROM g1063_txt;
