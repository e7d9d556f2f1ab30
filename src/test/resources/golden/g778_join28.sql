-- join28.q: subquery-join result joined against a PARTITION-PRUNED
-- third table (join condition carries the partition predicates),
-- INSERT OVERWRITE twice, read back.
DROP TABLE IF EXISTS g778_part;
DROP TABLE IF EXISTS g778_dest;
CREATE TABLE g778_part (key INT, value STRING, ds STRING) USING parquet PARTITIONED BY (ds);
INSERT INTO g778_part SELECT n_nationkey, n_name, '2008-04-08' FROM nation;
INSERT INTO g778_part SELECT n_nationkey, concat(n_name, '_other'), '2008-04-09' FROM nation;
CREATE TABLE g778_dest (key INT, value STRING);
INSERT OVERWRITE TABLE g778_dest
SELECT subq.key1, z.value
FROM (SELECT x.n_nationkey AS key1, x.n_name AS value1, y.n_nationkey AS key2
      FROM nation x JOIN nation y ON x.n_nationkey = y.n_nationkey) subq
JOIN g778_part z ON subq.key1 = z.key AND z.ds = '2008-04-08';
INSERT OVERWRITE TABLE g778_dest
SELECT subq.key1, z.value
FROM (SELECT x.n_nationkey AS key1, x.n_name AS value1, y.n_nationkey AS key2
      FROM nation x JOIN nation y ON x.n_nationkey = y.n_nationkey) subq
JOIN g778_part z ON subq.key1 = z.key AND z.ds = '2008-04-08';
SELECT key, value FROM g778_dest
