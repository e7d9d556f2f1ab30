-- union22.q shape: INSERT OVERWRITE a new partition from a union of a
-- filtered delta with a left-outer join of base against the delta
DROP TABLE IF EXISTS g364_base;
DROP TABLE IF EXISTS g364_delta;
CREATE TABLE g364_base (k1 BIGINT, k2 STRING) USING parquet PARTITIONED BY (ds STRING);
CREATE TABLE g364_delta (k0 BIGINT, k1 BIGINT, k2 STRING) USING parquet PARTITIONED BY (ds STRING);
INSERT OVERWRITE TABLE g364_base PARTITION (ds='1')
SELECT n_nationkey, n_name FROM nation;
INSERT OVERWRITE TABLE g364_delta PARTITION (ds='1')
SELECT n_nationkey, n_nationkey, upper(n_name) FROM nation WHERE n_nationkey < 12;
INSERT OVERWRITE TABLE g364_base PARTITION (ds='2')
SELECT * FROM (
  SELECT k1, k2 FROM g364_delta WHERE ds = '1' AND k0 <= 5
  UNION ALL
  SELECT a.k1, a.k2 FROM g364_base a LEFT OUTER JOIN
    (SELECT * FROM g364_delta WHERE ds = '1' AND k0 > 5) b
    ON a.k1 = b.k1 AND b.ds = '1'
  WHERE a.ds = '1' AND b.k1 IS NULL
) sub;
SELECT k1, k2, ds FROM g364_base WHERE ds = '2'
