-- reference: ql/src/test/queries/clientpositive/input_testxpath.q
-- (array index, struct member of an array element, map lookup) +
-- input_testxpath2.q (size() of list/map columns under IS NOT NULL
-- filters) over a thrift-shaped complex-typed table.
DROP TABLE IF EXISTS g1044_thrift;
CREATE TABLE g1044_thrift (
  lint ARRAY<INT>,
  lintstring ARRAY<STRUCT<myint: INT, mystring: STRING, underscore_int: INT>>,
  mstringstring MAP<STRING, STRING>) USING parquet;
INSERT INTO g1044_thrift SELECT
  array(n_nationkey, n_nationkey * 10, n_nationkey * 100),
  array(named_struct('myint', n_nationkey, 'mystring', n_name, 'underscore_int', n_regionkey)),
  map(concat('key_', n_regionkey), n_name)
FROM nation WHERE n_nationkey < 6;
INSERT INTO g1044_thrift VALUES (NULL, array(named_struct('myint', 99, 'mystring', 'tail', 'underscore_int', 9)), NULL);
SELECT t.lint[1] AS l1, t.lintstring[0].mystring AS ms, t.mstringstring['key_2'] AS mv
FROM g1044_thrift t WHERE t.lint IS NOT NULL
UNION ALL
SELECT size(t.lint), size(t.lintstring), size(t.mstringstring)
FROM g1044_thrift t WHERE t.lint IS NOT NULL AND NOT (t.mstringstring IS NULL);
