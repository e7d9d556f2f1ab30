-- reference: ql/src/test/queries/clientpositive/input7.q + input8.q +
-- input9.q — NULL in arithmetic lands typed NULLs in the target
-- columns; WHERE NULL = NULL selects nothing.
DROP TABLE IF EXISTS g1103_d1;
DROP TABLE IF EXISTS g1103_d2;
DROP TABLE IF EXISTS g1103_d3;
CREATE TABLE g1103_d1 (c1 DOUBLE, c2 INT) USING parquet;
INSERT OVERWRITE TABLE g1103_d1
  SELECT NULL, CAST(n_nationkey AS INT) FROM nation WHERE n_nationkey < 4;
CREATE TABLE g1103_d2 (c1 STRING, c2 INT, c3 DOUBLE) USING parquet;
INSERT OVERWRITE TABLE g1103_d2
  SELECT 4 + NULL, CAST(n_nationkey AS INT) - NULL, NULL + NULL
  FROM nation WHERE n_nationkey < 4;
CREATE TABLE g1103_d3 (value STRING, key INT) USING parquet;
INSERT OVERWRITE TABLE g1103_d3
  SELECT CAST(NULL AS STRING), CAST(n_nationkey AS INT)
  FROM nation WHERE NULL = NULL;
SELECT (SELECT count(*) FROM g1103_d1) AS n1,
       (SELECT count(c1) FROM g1103_d1) AS nn1,
       (SELECT sum(c2) FROM g1103_d1) AS s1,
       (SELECT count(c1) + count(c2) + count(c3) FROM g1103_d2) AS nn2,
       (SELECT count(*) FROM g1103_d2) AS n2,
       (SELECT count(*) FROM g1103_d3) AS n3
