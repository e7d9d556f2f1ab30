-- case_sensitivity.q: identifiers resolve case-insensitively — mixed-
-- case table and column references (incl. nested array/struct access)
-- name the same objects.
DROP TABLE IF EXISTS g929_thrift;
CREATE TABLE g929_thrift (lint ARRAY<INT>,
  lintstring ARRAY<STRUCT<mystring: STRING, myint: INT>>) USING parquet;
INSERT INTO g929_thrift
SELECT array(2, 7), array(named_struct('mystring', 'ms7', 'myint', 7));
INSERT INTO g929_thrift
SELECT array(-1, 9), array(named_struct('mystring', 'neg', 'myint', 9));
DROP TABLE IF EXISTS g929_dest;
CREATE TABLE G929_DEST (Key INT, VALUE STRING) USING parquet;
INSERT OVERWRITE TABLE g929_dest
SELECT g929_Thrift.LINT[1], g929_thrift.lintstring[0].MYSTRING
FROM G929_THRIFT WHERE g929_thrift.liNT[0] > 0;
SELECT G929_dest.* FROM g929_Dest
