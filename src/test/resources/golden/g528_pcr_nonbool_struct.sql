-- pcr.q tail: non-boolean partition expressions (true for ALL partitions
-- -> condition removed; true for a SUBSET -> pruned) and a partition
-- condition over a struct FIELD (PcrExprProcFactory.FieldExprProcessor).
DROP TABLE IF EXISTS g528_foo;
DROP TABLE IF EXISTS g528_field;
CREATE TABLE g528_foo (key INT, value STRING) PARTITIONED BY (ds INT);
INSERT INTO g528_foo PARTITION (ds=3)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 4;
INSERT INTO g528_foo PARTITION (ds=5)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 4;
INSERT INTO g528_foo PARTITION (ds=7)
  SELECT CAST(n_nationkey AS INT), concat('val_', n_nationkey) FROM nation WHERE n_nationkey < 4;
CREATE TABLE g528_field (s STRUCT<a:INT, b:STRING>) PARTITIONED BY (ds INT);
INSERT INTO g528_field PARTITION (ds=5)
  SELECT named_struct('a', CAST(n_nationkey AS INT), 'b', n_name)
  FROM nation WHERE n_nationkey < 2;
INSERT INTO g528_field PARTITION (ds=7)
  SELECT named_struct('a', CAST(-10 - n_nationkey AS INT), 'b', n_name)
  FROM nation WHERE n_nationkey < 2;
SELECT 'all_true' AS v, key, value, ds FROM g528_foo WHERE ds % 2 == 1
UNION ALL
SELECT 'subset', key, value, ds FROM g528_foo WHERE ds / 3 < 2
UNION ALL
SELECT 'struct_field', s.a, s.b, ds FROM g528_field WHERE (ds + s.a) > 0
