-- orc_min_max.q: min/max over every primitive family stored as ORC —
-- boolean, the integer ladder, float/double/decimal, timestamp/date,
-- string/char/varchar — with NULL rows present (nulls never win).
DROP TABLE IF EXISTS g989_at;
CREATE TABLE g989_at (bo BOOLEAN, ti TINYINT, si SMALLINT, i INT,
  bi BIGINT, f FLOAT, d DOUBLE, de DECIMAL(10,3), ts TIMESTAMP, da DATE,
  s STRING, c CHAR(5), vc VARCHAR(5)) STORED AS ORC;
INSERT INTO g989_at VALUES
  (true, CAST(1 AS TINYINT), CAST(10 AS SMALLINT), 100, CAST(1000 AS BIGINT),
   CAST(1.5 AS FLOAT), 2.5, CAST(12.345 AS DECIMAL(10,3)),
   CAST('2001-01-01 01:02:03' AS TIMESTAMP), CAST('2001-01-01' AS DATE),
   'abc', 'ab', 'ab'),
  (false, CAST(-2 AS TINYINT), CAST(-20 AS SMALLINT), -200, CAST(-2000 AS BIGINT),
   CAST(-1.5 AS FLOAT), -2.5, CAST(-12.345 AS DECIMAL(10,3)),
   CAST('1999-12-31 23:59:59' AS TIMESTAMP), CAST('1999-12-31' AS DATE),
   'xyz', 'xy', 'xy'),
  (NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   NULL, NULL, NULL);
SELECT min(bo) AS bo_min, max(bo) AS bo_max, min(ti) AS ti_min,
       max(ti) AS ti_max, min(si) AS si_min, max(si) AS si_max,
       min(i) AS i_min, max(i) AS i_max, min(bi) AS bi_min,
       max(bi) AS bi_max, min(f) AS f_min, max(f) AS f_max,
       min(d) AS d_min, max(d) AS d_max, min(de) AS de_min,
       max(de) AS de_max, CAST(min(ts) AS STRING) AS ts_min,
       CAST(max(ts) AS STRING) AS ts_max, min(da) AS da_min,
       max(da) AS da_max, min(s) AS s_min, max(s) AS s_max,
       min(c) AS c_min, max(c) AS c_max, min(vc) AS vc_min,
       max(vc) AS vc_max
FROM g989_at
