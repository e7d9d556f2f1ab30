-- union_remove_23.q: one branch aggregates OVER A JOIN subquery, the
-- other aggregates the base table — both land in one sink.
set hive.optimize.union.remove=true;
DROP TABLE IF EXISTS g773_in;
DROP TABLE IF EXISTS g773_out;
CREATE TABLE g773_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g773_out (key STRING, `values` BIGINT) STORED AS TEXTFILE;
INSERT INTO g773_in VALUES ('1','11'),('2','12'),('3','13'),('7','17'),('8','18'),('8','28');
INSERT OVERWRITE TABLE g773_out
SELECT * FROM (
  SELECT key, count(1) AS `values` FROM
    (SELECT a.key, b.val FROM g773_in a JOIN g773_in b ON a.key = b.key) subq
  GROUP BY key
  UNION ALL
  SELECT key, count(1) AS `values` FROM g773_in GROUP BY key
) subq2;
SELECT key, `values` FROM g773_out
