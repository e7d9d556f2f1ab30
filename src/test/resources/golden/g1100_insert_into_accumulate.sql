-- reference: ql/src/test/queries/clientpositive/insert_into4.q +
-- insert_into5.q — repeated INSERT INTO accumulates (no overwrite),
-- including a self-INSERT doubling and a static-partition target fed
-- from itself.
DROP TABLE IF EXISTS g1100_a;
DROP TABLE IF EXISTS g1100_b;
CREATE TABLE g1100_a (key INT, value STRING) USING parquet;
INSERT INTO TABLE g1100_a
  SELECT CAST(n_nationkey AS INT), n_name FROM nation LIMIT 10;
INSERT INTO TABLE g1100_a
  SELECT CAST(n_nationkey AS INT), n_name FROM nation LIMIT 10;
INSERT INTO TABLE g1100_a SELECT * FROM g1100_a;
CREATE TABLE g1100_b (key INT, value STRING)
  PARTITIONED BY (ds STRING) STORED AS PARQUET;
INSERT INTO TABLE g1100_b PARTITION (ds='1') SELECT * FROM g1100_a;
INSERT INTO TABLE g1100_b PARTITION (ds='1')
  SELECT key, value FROM g1100_b;
SELECT (SELECT count(*) FROM g1100_a) AS n_a,
       (SELECT count(*) FROM g1100_b) AS n_b,
       (SELECT count(DISTINCT key) FROM g1100_b) AS dk
