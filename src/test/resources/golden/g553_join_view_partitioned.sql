-- join_view.q: a view DEFINED AS a join of two partitioned tables on the
-- partition column, then queried with a partition filter — the filter
-- must prune through the view into both scans.
DROP VIEW IF EXISTS g553_v;
DROP TABLE IF EXISTS g553_invites;
DROP TABLE IF EXISTS g553_invites2;
CREATE TABLE g553_invites (foo INT, bar STRING) PARTITIONED BY (ds STRING);
CREATE TABLE g553_invites2 (foo INT, bar STRING) PARTITIONED BY (ds STRING);
INSERT INTO g553_invites PARTITION (ds='2011-09-01')
  SELECT CAST(n_nationkey AS INT), concat('bar_', n_nationkey) FROM nation WHERE n_nationkey < 3;
INSERT INTO g553_invites PARTITION (ds='2011-09-02')
  SELECT CAST(n_nationkey AS INT), concat('bar_', n_nationkey) FROM nation WHERE n_nationkey < 2;
INSERT INTO g553_invites2 PARTITION (ds='2011-09-01')
  SELECT CAST(n_nationkey * 10 AS INT), concat('b2_', n_nationkey) FROM nation WHERE n_nationkey < 2;
INSERT INTO g553_invites2 PARTITION (ds='2011-09-02')
  SELECT CAST(n_nationkey * 10 AS INT), concat('b2_', n_nationkey) FROM nation WHERE n_nationkey < 3;
CREATE VIEW g553_v AS
  SELECT g553_invites.bar, g553_invites2.foo, g553_invites2.ds
  FROM g553_invites JOIN g553_invites2 ON g553_invites.ds = g553_invites2.ds;
SELECT bar, foo, ds FROM g553_v WHERE ds = '2011-09-01'
