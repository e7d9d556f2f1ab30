-- reference: ql/src/test/queries/clientpositive/
-- update_all_non_partitioned.q + update_where_non_partitioned.q +
-- update_two_cols.q + update_after_multiple_inserts.q +
-- update_tmp_table.q — CoW UPDATE shapes: unconditional, filtered,
-- two columns at once, and after several accumulating inserts.
DROP TABLE IF EXISTS g1181_u;
CREATE TABLE g1181_u (a INT, b STRING, c DOUBLE)
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1181_u
  SELECT CAST(n_nationkey AS INT), n_name, CAST(n_regionkey AS DOUBLE)
  FROM nation WHERE n_nationkey < 5;
INSERT INTO g1181_u VALUES (90, 'later', 1.0);
UPDATE g1181_u SET b = 'all' WHERE a < 100;
UPDATE g1181_u SET b = 'two', c = 7.5 WHERE a = 2;
UPDATE g1181_u SET c = c + 1 WHERE a = 90;
SELECT a, b, c FROM g1181_u
