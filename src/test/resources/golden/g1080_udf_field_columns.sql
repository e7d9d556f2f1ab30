-- reference: ql/src/test/queries/clientpositive/udf_field.q — field()
-- over literals (string and int, NULL probe, NULL candidates) and over
-- column operands mixing types, like the reference's kv1 battery.
DROP TABLE IF EXISTS g1080_t;
CREATE TABLE g1080_t USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS col1, concat('val_', n_nationkey) AS col2
  FROM nation WHERE n_nationkey IN (3, 7);
SELECT col1, col2,
  field('7', col1) AS f1,
  field('7', col1, col2) AS f2,
  field('val_3', col1, col2) AS f3,
  field(NULL, col1, col2) AS f4,
  field(col1, 3, 7) AS f5,
  field(col1, '3', '7') AS f6,
  field(col1, '333', '777') AS f7,
  field(col1, col2, col1) AS f8,
  field('x', 'a', 'b', 'c', 'd') AS lx,
  field('c', 'a', 'b', NULL, 'c') AS lc,
  field(3, 1, 2, 3, 4) AS l3,
  field(4, 1, 2, NULL, 4) AS l4
FROM g1080_t
