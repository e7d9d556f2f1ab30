-- hive.merge.mapfiles (HiveConf.java:855; ConditionalResolverMergeFiles):
-- when enabled, an INSERT whose average output file size is under
-- hive.merge.smallfiles.avgsize (16 MB default) is followed by a merge
-- of ITS OWN output files into ~hive.merge.size.per.task-sized files —
-- observable through INPUT__FILE__NAME: 8 write tasks, 1 file after.
DROP TABLE IF EXISTS g699_t;
CREATE TABLE g699_t (v INT) USING parquet;
SET hive.merge.mapfiles=true;
INSERT INTO g699_t SELECT /*+ REPARTITION(8) */ CAST(id AS INT) FROM range(100);
SET hive.merge.mapfiles=false;
SELECT count(DISTINCT f) AS n_files, sum(n) AS n_rows, sum(s) AS s
FROM (SELECT INPUT__FILE__NAME AS f, count(*) AS n, sum(v) AS s
      FROM g699_t GROUP BY 1)
