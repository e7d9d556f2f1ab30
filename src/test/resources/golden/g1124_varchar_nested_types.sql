-- reference: ql/src/test/queries/clientpositive/varchar_nested_types.q
-- — VARCHAR(20) inside ARRAY, MAP, and STRUCT containers, plus a CTAS
-- and a view carrying the nested types.
DROP VIEW IF EXISTS g1124_view;
DROP TABLE IF EXISTS g1124_base;
DROP TABLE IF EXISTS g1124_arr;
DROP TABLE IF EXISTS g1124_map;
DROP TABLE IF EXISTS g1124_struct;
DROP TABLE IF EXISTS g1124_cta;
CREATE TABLE g1124_base (key INT, value VARCHAR(20)) USING parquet;
INSERT OVERWRITE TABLE g1124_base
  SELECT CAST(n_nationkey AS INT), CAST(n_name AS VARCHAR(20))
  FROM nation ORDER BY 1 LIMIT 1;
CREATE TABLE g1124_arr (c1 ARRAY<VARCHAR(20)>);
INSERT OVERWRITE TABLE g1124_arr SELECT array(value, value) FROM g1124_base;
CREATE TABLE g1124_map (c1 MAP<INT, VARCHAR(20)>);
INSERT OVERWRITE TABLE g1124_map SELECT map(key, value) FROM g1124_base;
CREATE TABLE g1124_struct (c1 STRUCT<a:INT, b:VARCHAR(20), c:STRING>);
INSERT OVERWRITE TABLE g1124_struct
  SELECT named_struct('a', key, 'b', value, 'c', CAST(value AS STRING))
  FROM g1124_base;
CREATE TABLE g1124_cta AS SELECT * FROM g1124_struct;
CREATE VIEW g1124_view AS SELECT c1.b AS b FROM g1124_cta;
SELECT (SELECT c1[0] FROM g1124_arr) AS arr0,
       (SELECT map_values(c1)[0] FROM g1124_map) AS mapv,
       (SELECT c1.b FROM g1124_struct) AS structb,
       (SELECT b FROM g1124_view) AS viewb
