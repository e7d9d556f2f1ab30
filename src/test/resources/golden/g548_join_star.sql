-- join_star.q: star schema — one fact joined to many small dims on
-- distinct single-column keys (the all-broadcast map-join chain), with a
-- left outer leg mixed in; measures and dim payloads projected together.
DROP TABLE IF EXISTS g548_fact;
DROP TABLE IF EXISTS g548_dim1;
DROP TABLE IF EXISTS g548_dim2;
DROP TABLE IF EXISTS g548_dim3;
CREATE TABLE g548_fact USING parquet AS
  SELECT CAST(n_nationkey AS INT) AS m1, CAST(n_regionkey AS INT) AS m2,
         CAST(n_nationkey % 5 AS INT) AS d1, CAST(n_nationkey % 3 AS INT) AS d2,
         CAST(n_nationkey % 7 AS INT) AS d3
  FROM nation;
CREATE TABLE g548_dim1 USING parquet AS
  SELECT CAST(r_regionkey AS INT) AS f1, concat('d1_', r_name) AS f2 FROM region;
CREATE TABLE g548_dim2 USING parquet AS
  SELECT CAST(r_regionkey AS INT) AS f3, concat('d2_', r_name) AS f4 FROM region;
CREATE TABLE g548_dim3 USING parquet AS
  SELECT CAST(r_regionkey AS INT) AS f5, concat('d3_', r_name) AS f6 FROM region;
SELECT f.m1 AS m1, d1.f2 AS p1, d2.f4 AS p2, d3.f6 AS p3
FROM g548_fact f
JOIN g548_dim1 d1 ON f.d1 = d1.f1
JOIN g548_dim2 d2 ON f.d2 = d2.f3
LEFT OUTER JOIN g548_dim3 d3 ON f.d3 = d3.f5
