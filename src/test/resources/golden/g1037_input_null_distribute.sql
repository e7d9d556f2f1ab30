-- reference: ql/src/test/queries/clientpositive/input21.q — a table with
-- NULLs in several columns run through DISTRIBUTE BY c SORT BY d: NULL
-- keys all land in one distribution bucket and sort first, and NULL
-- values pass through untouched.
DROP TABLE IF EXISTS g1037_null;
CREATE TABLE g1037_null (a STRING, b STRING, c STRING, d STRING) USING parquet;
INSERT INTO g1037_null VALUES
  ('1.0', '1', 'same', 'one'),
  ('1.0', NULL, 'same', 'two'),
  (NULL, '2', 'same', 'three'),
  ('10.0', NULL, 'same', NULL),
  (NULL, NULL, NULL, 'four'),
  ('1.0', '1', NULL, NULL);
SELECT * FROM g1037_null DISTRIBUTE BY c SORT BY d;
