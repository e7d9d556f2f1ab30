-- reference: ql/src/test/queries/clientpositive/orc_ppd_date.q — DATE
-- predicates over ORC in the reference's comparand shapes: bare string,
-- DATE literal, CAST AS DATE, CAST AS VARCHAR, !=, <, <=, IN, BETWEEN.
DROP TABLE IF EXISTS g1073_newtypesorc;
CREATE TABLE g1073_newtypesorc (c CHAR(10), d DECIMAL(5,3), da DATE)
  STORED AS ORC;
INSERT OVERWRITE TABLE g1073_newtypesorc
  SELECT * FROM (
    SELECT CAST('apple' AS CHAR(10)), CAST(0.22 AS DECIMAL(5,3)),
           CAST('1970-02-20' AS DATE) FROM nation
    UNION ALL
    SELECT CAST('hello' AS CHAR(10)), CAST(11.22 AS DECIMAL(5,3)),
           CAST('1970-02-27' AS DATE) FROM nation) u;
SET hive.optimize.index.filter=true;
SELECT
  (SELECT count(*) FROM g1073_newtypesorc WHERE da = '1970-02-20') AS eq_str,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da = DATE '1970-02-20') AS eq_lit,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da = CAST('1970-02-20' AS DATE)) AS eq_cast,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da = CAST('1970-02-20' AS VARCHAR(20))) AS eq_vc,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da != '1970-02-20') AS ne_str,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da < '1970-02-27') AS lt_str,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da <= '1970-02-27') AS le_str,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da IN (CAST('1970-02-21' AS DATE), CAST('1970-02-27' AS DATE))) AS in_dates,
  (SELECT count(*) FROM g1073_newtypesorc WHERE da BETWEEN '1970-02-19' AND '1970-02-22') AS btw_str
