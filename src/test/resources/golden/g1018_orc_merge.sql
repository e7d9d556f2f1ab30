-- orc_merge1.q / alter_merge_2_orc.q: ALTER TABLE ... PARTITION ...
-- CONCATENATE over ORC — many small files compact, the row multiset is
-- untouched (counts and sums identical after the merge).
DROP TABLE IF EXISTS g1018_om;
CREATE TABLE g1018_om (key INT, value STRING)
  STORED AS ORC PARTITIONED BY (ds STRING);
INSERT INTO g1018_om PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 9;
INSERT INTO g1018_om PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey BETWEEN 9 AND 14;
INSERT INTO g1018_om PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey > 14;
ALTER TABLE g1018_om PARTITION (ds='1') CONCATENATE;
SELECT count(*) AS n, CAST(sum(key) AS BIGINT) AS s,
       min(value) AS mn, max(value) AS mx
FROM g1018_om WHERE ds='1'
