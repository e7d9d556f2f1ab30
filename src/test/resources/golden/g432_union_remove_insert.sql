-- union_remove_1.q: INSERT OVERWRITE of a UNION ALL of two identical
-- group-bys (Hive's union-remove optimization writes both branches
-- straight to the sink; rows are the contract).
set hive.optimize.union.remove=true;
DROP TABLE IF EXISTS g432_in;
DROP TABLE IF EXISTS g432_out;
CREATE TABLE g432_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g432_out (key STRING, `values` BIGINT) STORED AS TEXTFILE;
INSERT INTO g432_in VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18'), ('8','28');
INSERT OVERWRITE TABLE g432_out
SELECT * FROM (
  SELECT key, count(1) AS `values` FROM g432_in GROUP BY key
  UNION ALL
  SELECT key, count(1) AS `values` FROM g432_in GROUP BY key
) a;
SELECT key, `values` FROM g432_out
