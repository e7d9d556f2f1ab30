-- reference: ql/src/test/queries/clientpositive/acid_overwrite.q (+
-- acid_vectorization.q, acid_vectorization_project.q shapes) — INSERT
-- OVERWRITE on a transactional (CoW) table replaces prior content;
-- a following UPDATE and a projected read see the overwritten rows.
DROP TABLE IF EXISTS g1160_acid;
CREATE TABLE g1160_acid (a INT, b STRING)
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1160_acid
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 20;
INSERT OVERWRITE TABLE g1160_acid
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 8;
UPDATE g1160_acid SET b = 'updated' WHERE a = 3;
SELECT a, b FROM g1160_acid
