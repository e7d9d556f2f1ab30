-- create_nested_type.q / input_lazyserde.q: STORED AS TEXTFILE tables
-- with nested complex types run through the REAL LazySimpleSerDe
-- (graft-text source): array-of-map and map-of-array columns round-trip
-- through the serde's nested \002/\003/deeper separators, and reads
-- access any nesting level. The final SELECT pins values drawn from
-- every level.
DROP TABLE IF EXISTS g692_t;
CREATE TABLE g692_t (
  a STRING,
  b ARRAY<STRING>,
  c ARRAY<MAP<STRING, STRING>>,
  d MAP<STRING, ARRAY<STRING>>
) STORED AS TEXTFILE;
INSERT INTO g692_t SELECT
  'row1', array('b1', 'b2'),
  array(map('k1', 'v1', 'k2', 'v2'), map('k3', 'v3')),
  map('outer', array('i1', 'i2'));
INSERT INTO g692_t SELECT
  'row2', array('solo'),
  array(map('x', 'y')),
  map('m1', array('z'), 'm2', array('w1', 'w2', 'w3'));
SELECT a, size(b) AS nb, b[0] AS b0,
       c[0]['k1'] AS c0k1, c[size(c) - 1] AS clast,
       d['m2'][2] AS dm2_2, size(d) AS nd
FROM g692_t ORDER BY a
