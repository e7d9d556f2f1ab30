-- char_nested_types.q: char(20) inside array / map VALUE (int keys) /
-- struct, then the struct table re-landed through CTAS — every read
-- shows the STRIPPED value (the r16 recursive CharStripReads surface),
-- and the CTAS copy preserves the values.
DROP TABLE IF EXISTS g979_n1;
DROP TABLE IF EXISTS g979_arr;
DROP TABLE IF EXISTS g979_map;
DROP TABLE IF EXISTS g979_struct;
DROP TABLE IF EXISTS g979_cta;
CREATE TABLE g979_n1 (key INT, value CHAR(20)) USING parquet;
INSERT OVERWRITE TABLE g979_n1
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  ORDER BY n_nationkey LIMIT 1;
CREATE TABLE g979_arr (c1 ARRAY<CHAR(20)>) USING parquet;
INSERT OVERWRITE TABLE g979_arr SELECT array(value, value) FROM g979_n1;
CREATE TABLE g979_map (c1 MAP<INT, CHAR(20)>) USING parquet;
INSERT OVERWRITE TABLE g979_map SELECT map(key, value) FROM g979_n1;
CREATE TABLE g979_struct (c1 STRUCT<a: INT, b: CHAR(20), c: STRING>)
  USING parquet;
INSERT OVERWRITE TABLE g979_struct
  SELECT named_struct('a', key, 'b', value, 'c', cast(value AS STRING))
  FROM g979_n1;
CREATE TABLE g979_cta USING parquet AS SELECT * FROM g979_struct;
SELECT a.c1[0] AS arr0, length(a.c1[1]) AS arr1len,
       m.c1[0] AS map0, length(m.c1[0]) AS map0len,
       s.c1.b AS sb, length(s.c1.b) AS sblen, s.c1.c AS sc,
       t.c1.b AS ctab, length(t.c1.b) AS ctablen
FROM g979_arr a CROSS JOIN g979_map m
CROSS JOIN g979_struct s CROSS JOIN g979_cta t
