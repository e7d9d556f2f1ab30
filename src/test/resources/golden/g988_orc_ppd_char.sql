-- orc_ppd_char.q: predicate pushdown over ORC char/varchar/decimal/date
-- columns — EQUAL / NOT_EQUAL / LESS_THAN / IN / BETWEEN all compare on
-- the STRIPPED char value and return identical row sets with pushdown
-- on (the stem toggles hive.optimize.index.filter; here both paths run
-- through the same ORC scan and the values are the pin).
DROP TABLE IF EXISTS g988_nt;
CREATE TABLE g988_nt (c CHAR(10), v VARCHAR(10), d DECIMAL(5,3), da DATE)
  STORED AS ORC;
INSERT OVERWRITE TABLE g988_nt
  SELECT * FROM (
    SELECT cast('apple' AS char(10)) AS c, cast('bee' AS varchar(10)) AS v,
           CAST(0.22 AS DECIMAL(5,3)) AS d, cast('1970-02-20' AS date) AS da
    FROM nation WHERE n_nationkey < 5
    UNION ALL
    SELECT cast('hello' AS char(10)), cast('world' AS varchar(10)),
           CAST(11.22 AS DECIMAL(5,3)), cast('1970-02-27' AS date)
    FROM nation WHERE n_nationkey < 3
  ) u;
SELECT (SELECT count(*) FROM g988_nt WHERE c = 'apple') AS c_eq,
       (SELECT count(*) FROM g988_nt WHERE c != 'apple') AS c_ne,
       (SELECT count(*) FROM g988_nt WHERE c < 'hello') AS c_lt,
       (SELECT count(*) FROM g988_nt WHERE c IN ('apple', 'carrot')) AS c_in,
       (SELECT count(*) FROM g988_nt WHERE v BETWEEN 'bee' AND 'orange') AS v_bw,
       (SELECT count(*) FROM g988_nt WHERE d = 0.22) AS d_eq,
       (SELECT count(*) FROM g988_nt WHERE d > 1) AS d_gt,
       (SELECT count(*) FROM g988_nt WHERE da = '1970-02-20') AS da_eq,
       (SELECT count(*) FROM g988_nt
          WHERE da BETWEEN '1970-02-19' AND '1970-02-22') AS da_bw
