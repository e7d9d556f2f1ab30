-- reference: ql/src/test/queries/clientpositive/transform_acid.q —
-- SELECT TRANSFORM reading FROM a transactional (CoW) table after an
-- UPDATE: the script sees post-update rows.
DROP TABLE IF EXISTS g1190_acid;
CREATE TABLE g1190_acid (a INT, b STRING)
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1190_acid
  SELECT CAST(n_nationkey AS INT), n_name FROM nation WHERE n_nationkey < 5;
UPDATE g1190_acid SET b = 'patched' WHERE a = 2;
SELECT t.ta, t.tb FROM (
  SELECT TRANSFORM(a, b) USING 'cat' AS (ta, tb) FROM g1190_acid
) t
