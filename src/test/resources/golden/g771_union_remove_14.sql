-- union_remove_14.q: union of a CONSTANT-projection branch and a join
-- branch into a BIGINT sink column.
set hive.optimize.union.remove=true;
DROP TABLE IF EXISTS g771_in;
DROP TABLE IF EXISTS g771_out;
CREATE TABLE g771_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g771_out (key STRING, `values` BIGINT) STORED AS TEXTFILE;
INSERT INTO g771_in VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g771_out
SELECT * FROM (
  SELECT key, 1 AS `values` FROM g771_in
  UNION ALL
  SELECT a.key AS key, b.val AS `values` FROM g771_in a JOIN g771_in b ON a.key = b.key
) c;
SELECT key, `values` FROM g771_out
