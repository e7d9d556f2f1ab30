-- avro_nullable_fields.q: every avro-mapped type nullable — each row
-- NULLs a different column (union-with-null schema branches) and the
-- values round-trip bit-exact through STORED AS AVRO.
DROP TABLE IF EXISTS g966_avro_null;
CREATE TABLE g966_avro_null (
  string1 STRING, int1 INT, tinyint1 TINYINT, smallint1 SMALLINT,
  bigint1 BIGINT, boolean1 BOOLEAN, float1 FLOAT, double1 DOUBLE,
  list1 ARRAY<STRING>, map1 MAP<STRING, INT>,
  struct1 STRUCT<sint: INT, sboolean: BOOLEAN, sstring: STRING>,
  nullableint INT, bytes1 BINARY
) STORED AS AVRO;
INSERT OVERWRITE TABLE g966_avro_null SELECT * FROM (
  SELECT 'why hello there' AS string1, 42 AS int1, CAST(3 AS TINYINT) AS tinyint1,
         CAST(100 AS SMALLINT) AS smallint1, CAST(1412341 AS BIGINT) AS bigint1,
         true AS boolean1, CAST(42.43 AS FLOAT) AS float1, 85.23423424 AS double1,
         array('alpha', 'beta', 'gamma') AS list1,
         map('Earth', 42, 'Bob', 31) AS map1,
         named_struct('sint', 17, 'sboolean', true, 'sstring', 'Abe Linkedin') AS struct1,
         72 AS nullableint, CAST('bc' AS BINARY) AS bytes1
  UNION ALL
  SELECT NULL, 98, CAST(4 AS TINYINT), CAST(101 AS SMALLINT),
         CAST(9999999 AS BIGINT), false, CAST(99.89 AS FLOAT), 0.00000009,
         array('beta'), map('Earth', 101),
         named_struct('sint', 1134, 'sboolean', false, 'sstring', 'wazzup'),
         NULL, CAST('ef' AS BINARY)
  UNION ALL
  SELECT 'third record', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         NULL, NULL, NULL, NULL, NULL
) v;
SELECT string1, int1, tinyint1, smallint1, bigint1, boolean1,
       round(float1, 2) AS float1, double1, CAST(list1 AS STRING) AS list1s,
       map1['Earth'] AS m_earth, struct1.sint AS s_int,
       struct1.sstring AS s_str, nullableint,
       CAST(bytes1 AS STRING) AS bytes1s
FROM g966_avro_null
