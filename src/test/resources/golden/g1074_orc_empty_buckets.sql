-- reference: ql/src/test/queries/clientpositive/orc_empty_files.q — a
-- 3-bucket ORC table where only one bucket holds data; reads must
-- handle the empty bucket files on either side of the populated one.
DROP TABLE IF EXISTS g1074_orc;
CREATE TABLE g1074_orc (key STRING, cnt INT)
  CLUSTERED BY (key) INTO 3 BUCKETS
  STORED AS ORC;
INSERT OVERWRITE TABLE g1074_orc
  SELECT one, CAST(COUNT(*) AS INT)
  FROM (SELECT '1' AS one FROM lineitem) a GROUP BY one;
SELECT count(*) AS c, min(key) AS k, min(cnt) AS n FROM g1074_orc
