-- reference: ql/src/test/queries/clientpositive/
-- delete_all_non_partitioned.q + delete_where_non_partitioned.q +
-- delete_where_no_match.q + delete_all_partitioned.q +
-- delete_whole_partition.q + delete_tmp_table.q — the CoW DELETE
-- shapes: delete-all, filtered delete, a predicate matching nothing,
-- and deleting one whole partition by its key.
DROP TABLE IF EXISTS g1168_np;
DROP TABLE IF EXISTS g1168_p;
CREATE TABLE g1168_np (a INT, b STRING)
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1168_np
  SELECT CAST(n_nationkey AS INT), n_name FROM nation;
DELETE FROM g1168_np WHERE a >= 20;
DELETE FROM g1168_np WHERE a = 9999;
CREATE TABLE g1168_p (a INT)
  PARTITIONED BY (ds STRING)
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1168_p PARTITION (ds='keep')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 5;
INSERT INTO g1168_p PARTITION (ds='gone')
  SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 7;
DELETE FROM g1168_p WHERE ds = 'gone';
SELECT (SELECT count(*) FROM g1168_np) AS np_left,
       (SELECT max(a) FROM g1168_np) AS np_max,
       (SELECT count(*) FROM g1168_p) AS p_left,
       (SELECT count(DISTINCT ds) FROM g1168_p) AS p_parts
