-- reference: ql/src/test/queries/clientpositive/orc_ppd_decimal.q —
-- DECIMAL(5,3) predicates over an ORC table in every comparison shape
-- the reference batteries: decimal literal, string comparand (coerces
-- via double), float cast (0.22f != 0.220 exactly — stays 0), !=, <,
-- <=, IN, BETWEEN. index.filter on/off must agree (Catalyst pushes ORC
-- predicates either way; the conf is accepted Hive surface).
DROP TABLE IF EXISTS g1072_newtypesorc;
CREATE TABLE g1072_newtypesorc (c CHAR(10), v VARCHAR(10), d DECIMAL(5,3), da DATE)
  STORED AS ORC;
INSERT OVERWRITE TABLE g1072_newtypesorc
  SELECT * FROM (
    SELECT CAST('apple' AS CHAR(10)), CAST('bee' AS VARCHAR(10)),
           CAST(0.22 AS DECIMAL(5,3)), CAST('1970-02-20' AS DATE)
    FROM nation
    UNION ALL
    SELECT CAST('hello' AS CHAR(10)), CAST('world' AS VARCHAR(10)),
           CAST(11.22 AS DECIMAL(5,3)), CAST('1970-02-27' AS DATE)
    FROM nation) u;
SET hive.optimize.index.filter=true;
SELECT
  (SELECT count(*) FROM g1072_newtypesorc WHERE d = 0.22) AS eq_dec,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d = '0.22') AS eq_str,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d = CAST('0.22' AS FLOAT)) AS eq_float,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d != 0.22) AS ne_dec,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d < 11.22) AS lt_dec,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d <= 11.22) AS le_dec,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d IN ('0.22', '11.22')) AS in_str,
  (SELECT count(*) FROM g1072_newtypesorc WHERE d BETWEEN 0 AND 1) AS btw_dec
