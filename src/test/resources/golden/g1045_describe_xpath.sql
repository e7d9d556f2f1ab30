-- reference: ql/src/test/queries/clientpositive/describe_xpath.q —
-- DESCRIBE through complex-type paths: a list column, its $elem$, a
-- map's $key$ and $value$, a struct element of a list (fields listed as
-- rows), and one member of that element. Name resolution is
-- case-insensitive (mStringString / lintString).
DROP TABLE IF EXISTS g1045_thrift;
CREATE TABLE g1045_thrift (
  lint ARRAY<INT>,
  lintstring ARRAY<STRUCT<myint: INT, mystring: STRING, underscore_int: INT>>,
  mstringstring MAP<STRING, STRING>) USING parquet;
DESCRIBE g1045_thrift.lint;
DESCRIBE g1045_thrift.lint.$elem$;
DESCRIBE g1045_thrift.mStringString.$key$;
DESCRIBE g1045_thrift.mStringString.$value$;
DESCRIBE g1045_thrift.lintString.$elem$.myint;
DESCRIBE g1045_thrift.lintString.$elem$;
