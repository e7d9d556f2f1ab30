-- avro_charvarchar.q: char(5)/varchar(10) columns — top-level, map
-- values of char(2), and a varchar(4) struct member — survive the avro
-- round trip (avro has no char type; the declared lengths live in the
-- table schema and reads strip/truncate per Hive semantics).
DROP TABLE IF EXISTS g965_avro_cv;
CREATE TABLE g965_avro_cv (
  cchar CHAR(5),
  cvarchar VARCHAR(10),
  m1 MAP<STRING, CHAR(2)>,
  l1 ARRAY<STRING>,
  st1 STRUCT<c1: INT, c2: VARCHAR(4)>
) STORED AS AVRO;
INSERT OVERWRITE TABLE g965_avro_cv
  SELECT * FROM (
    SELECT 'ab' AS cchar, 'xyz' AS cvarchar,
           map('k1', 'p', 'k2', 'qr') AS m1,
           array('one', 'two') AS l1,
           named_struct('c1', 7, 'c2', 'best') AS st1
    UNION ALL
    SELECT 'hello', 'helloworld', map('k', 'zz'), array('x'),
           named_struct('c1', 1, 'c2', 'ok')
  ) v;
SELECT cchar, length(cchar) AS clen, cvarchar, length(cvarchar) AS vlen,
       m1['k1'] AS mk1, CAST(l1 AS STRING) AS l1s,
       st1.c1 AS sc1, st1.c2 AS sc2, length(st1.c2) AS sc2len
FROM g965_avro_cv
