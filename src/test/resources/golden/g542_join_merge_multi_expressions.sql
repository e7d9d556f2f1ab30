-- join_merge_multi_expressions.q: a three-way self-join on the SAME
-- multi-column key (key, hr) — Hive merges the two joins into one
-- MapReduce join operator; the merged plan must keep multiset semantics
-- (duplicate keys multiply through both hops).
DROP TABLE IF EXISTS g542_srcpart;
CREATE TABLE g542_srcpart (key INT, value STRING) PARTITIONED BY (hr INT);
INSERT INTO g542_srcpart PARTITION (hr=11)
  SELECT CAST(n_nationkey % 6 AS INT), concat('val_', n_nationkey) FROM nation;
INSERT INTO g542_srcpart PARTITION (hr=12)
  SELECT CAST(n_nationkey % 4 AS INT), concat('val_', n_nationkey) FROM nation;
SELECT count(*) AS c
FROM g542_srcpart a
JOIN g542_srcpart b ON a.key = b.key AND a.hr = b.hr
JOIN g542_srcpart c ON a.hr = c.hr AND a.key = c.key
