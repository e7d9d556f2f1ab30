-- union_remove_13.q: union of an AGGREGATE branch and a JOIN branch
-- (mixed map-only + reduce branches under union-remove), inserted into
-- one TEXTFILE sink (the reference writes RCFILE; the container is covered by the rcfile goldens — the semantics here are the branches); the join branch's string val lands in a BIGINT column
-- (Hive's implicit cast).
set hive.optimize.union.remove=true;
DROP TABLE IF EXISTS g770_in;
DROP TABLE IF EXISTS g770_out;
CREATE TABLE g770_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g770_out (key STRING, `values` BIGINT) STORED AS TEXTFILE;
INSERT INTO g770_in VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g770_out
SELECT * FROM (
  SELECT key, count(1) AS `values` FROM g770_in GROUP BY key
  UNION ALL
  SELECT a.key AS key, b.val AS `values` FROM g770_in a JOIN g770_in b ON a.key = b.key
) c;
SELECT key, `values` FROM g770_out
