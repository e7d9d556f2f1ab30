-- reference: ql/src/test/queries/clientpositive/ctas_date.q (+
-- ctas_varchar.q shape) — DATE (and VARCHAR) columns through CTAS and
-- through views filtering on date literals.
DROP VIEW IF EXISTS g1096_v3;
DROP VIEW IF EXISTS g1096_v4;
DROP TABLE IF EXISTS g1096_t1;
DROP TABLE IF EXISTS g1096_t2;
CREATE TABLE g1096_t1 (key INT, value STRING, dd DATE) USING parquet;
INSERT OVERWRITE TABLE g1096_t1
  SELECT CAST(n_nationkey AS INT), n_name,
         CASE WHEN n_nationkey % 2 = 0 THEN DATE '2012-01-01'
              ELSE DATE '1999-06-15' END
  FROM nation WHERE n_nationkey < 5;
CREATE TABLE g1096_t2 AS
  SELECT key, CAST(value AS VARCHAR(12)) AS value, dd,
         DATE '1980-12-12' AS anchor
  FROM g1096_t1;
CREATE VIEW g1096_v3 AS SELECT * FROM g1096_t2 WHERE dd > DATE '2000-01-01';
CREATE VIEW g1096_v4 AS SELECT * FROM g1096_t2 WHERE dd < DATE '2000-01-01';
SELECT t.key, t.value, t.dd, t.anchor,
       (SELECT count(*) FROM g1096_v3) AS n_after_2000,
       (SELECT count(*) FROM g1096_v4) AS n_before_2000
FROM g1096_t2 t
