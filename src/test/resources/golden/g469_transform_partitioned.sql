-- transform_ppr1.q shape: TRANSFORM over a partitioned table with the
-- partition column flowing through the script and filtered outside.
set hive.optimize.ppd=true;
DROP TABLE IF EXISTS g469_p;
CREATE TABLE g469_p (key INT, value STRING) PARTITIONED BY (ds STRING);
INSERT INTO g469_p PARTITION (ds='2008-04-08') VALUES (86,'v86'), (27,'v27'), (98,'v98'), (150,'v150');
INSERT INTO g469_p PARTITION (ds='2008-04-09') VALUES (86,'w86'), (27,'w27');
SELECT tmap.tkey AS k, tmap.tvalue AS v
FROM (
  FROM g469_p src
  SELECT TRANSFORM(src.ds, src.key, src.value)
         USING 'cat' AS (ds, tkey, tvalue)
  CLUSTER BY tkey
) tmap
WHERE tmap.tkey < 100 AND tmap.ds = '2008-04-08'
