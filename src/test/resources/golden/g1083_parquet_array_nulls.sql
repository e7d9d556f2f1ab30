-- reference: ql/src/test/queries/clientpositive/
-- parquet_array_null_element.q (+ the parquet_array_of_* family) —
-- ARRAY<INT>/ARRAY<STRING>/MAP with NULL elements and NULL containers
-- survive the parquet round trip element-for-element.
DROP TABLE IF EXISTS g1083_staging;
DROP TABLE IF EXISTS g1083_parq;
CREATE TABLE g1083_staging (
  id INT, lstint ARRAY<INT>, lststr ARRAY<STRING>, mp MAP<STRING,STRING>
) USING parquet;
INSERT INTO g1083_staging VALUES
  (1, array(1, NULL, 3), array('a', NULL), map('k1', 'v1', 'k2', NULL)),
  (2, NULL, array(NULL), map('k', NULL)),
  (3, array(NULL), NULL, NULL);
CREATE TABLE g1083_parq (
  id INT, lstint ARRAY<INT>, lststr ARRAY<STRING>, mp MAP<STRING,STRING>
) STORED AS PARQUET;
INSERT OVERWRITE TABLE g1083_parq SELECT * FROM g1083_staging;
SELECT id, size(lstint) AS ni, lstint[0] AS i0, lstint[1] AS i1,
       size(lststr) AS ns, lststr[0] AS s0,
       mp['k1'] AS v1, mp['k2'] AS v2, mp['k'] AS vk
FROM g1083_parq
