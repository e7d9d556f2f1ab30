-- reference: ql/src/test/queries/clientpositive/create_like2.q +
-- create_like_tbl_props.q + create_like_view.q + create_1.q +
-- create_default_prop.q — CREATE TABLE LIKE a table (schema copied,
-- data NOT), LIKE with extra TBLPROPERTIES, and LIKE a VIEW
-- (materializes the view's schema as an empty table).
DROP VIEW IF EXISTS g1166_v;
DROP TABLE IF EXISTS g1166_src;
DROP TABLE IF EXISTS g1166_like1;
DROP TABLE IF EXISTS g1166_like2;
DROP TABLE IF EXISTS g1166_likev;
CREATE TABLE g1166_src USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS key, n_name AS value FROM nation;
CREATE TABLE g1166_like1 LIKE g1166_src;
CREATE TABLE g1166_like2 LIKE g1166_src
  TBLPROPERTIES ('key1'='value1', 'key2'='value2');
CREATE VIEW g1166_v AS SELECT key, upper(value) AS uv FROM g1166_src;
CREATE TABLE g1166_likev LIKE g1166_v;
INSERT INTO g1166_like1 SELECT * FROM g1166_src WHERE key < 3;
INSERT INTO g1166_likev SELECT key, value FROM g1166_src WHERE key < 2;
SELECT (SELECT count(*) FROM g1166_like1) AS n1,
       (SELECT count(*) FROM g1166_like2) AS n2_empty,
       (SELECT count(*) FROM g1166_likev) AS nv
