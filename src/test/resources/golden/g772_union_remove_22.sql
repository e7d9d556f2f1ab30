-- union_remove_22.q: the union result's column referenced TWICE in the
-- inserting select (a.values, a.values) — projection duplication above
-- a removed union.
set hive.optimize.union.remove=true;
DROP TABLE IF EXISTS g772_in;
DROP TABLE IF EXISTS g772_out;
CREATE TABLE g772_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g772_out (key STRING, `values` BIGINT, values2 BIGINT) STORED AS TEXTFILE;
INSERT INTO g772_in VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g772_out
SELECT a.key, a.`values`, a.`values`
FROM (
  SELECT key, count(1) AS `values` FROM g772_in GROUP BY key
  UNION ALL
  SELECT key, count(1) AS `values` FROM g772_in GROUP BY key
) a;
SELECT key, `values`, values2 FROM g772_out
