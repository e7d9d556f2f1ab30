-- reference: ql/src/test/queries/clientpositive/orc_create.q — ORC table
-- with MAP/ARRAY/STRUCT columns, plus the ALTER TABLE SET FILEFORMAT ORC
-- path on a (default-textfile) partitioned table before its first write.
DROP TABLE IF EXISTS g1070_complex;
DROP TABLE IF EXISTS g1070_evolve;
CREATE TABLE g1070_complex (
  str STRING,
  mp  MAP<STRING,STRING>,
  lst ARRAY<STRING>,
  strct STRUCT<a:STRING, b:STRING>
) STORED AS ORC;
INSERT INTO g1070_complex
  SELECT n_name, map('k1', n_name), array(n_name, 'x'),
         named_struct('a', n_name, 'b', 'bb')
  FROM nation WHERE n_nationkey < 5;
CREATE TABLE g1070_evolve (key INT, value STRING) PARTITIONED BY (ds STRING);
ALTER TABLE g1070_evolve SET FILEFORMAT ORC;
INSERT INTO g1070_evolve PARTITION (ds='1')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 5;
SELECT c.str, c.mp['k1'] AS mv, c.lst[1] AS l1, c.strct.a AS sa,
       e.key, e.ds
FROM g1070_complex c JOIN g1070_evolve e ON c.str = e.value
