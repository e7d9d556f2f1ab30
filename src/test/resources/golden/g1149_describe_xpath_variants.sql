-- reference: ql/src/test/queries/clientpositive/describe_xpath.q
-- variants (describe_xpath1.q..describe_xpath4.q in older trees) —
-- DESCRIBE table.column xpath walks: $elem$ of a list, $key$/$value$
-- of a map, a struct-list element, and a member INSIDE that element.
DROP TABLE IF EXISTS g1149_thrift;
CREATE TABLE g1149_thrift (
  lint ARRAY<INT>,
  mstringstring MAP<STRING, STRING>,
  lintstring ARRAY<STRUCT<myint:INT, mystring:STRING>>
) USING parquet;
DESCRIBE g1149_thrift.lint;
DESCRIBE g1149_thrift.lint.$elem$;
DESCRIBE g1149_thrift.mstringstring.$key$;
DESCRIBE g1149_thrift.mstringstring.$value$;
DESCRIBE g1149_thrift.lintstring.$elem$;
DESCRIBE g1149_thrift.lintstring.$elem$.myint
