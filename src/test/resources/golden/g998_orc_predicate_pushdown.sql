-- orc_predicate_pushdown.q: the numeric/string predicate battery over
-- an ORC table — range predicates on every integer width, float/double
-- comparisons against decimal-looking literals, LIKE and BETWEEN on
-- strings, null-safe hash aggregation of the survivors.
DROP TABLE IF EXISTS g998_pred;
CREATE TABLE g998_pred (t TINYINT, si SMALLINT, i INT, b BIGINT,
  f FLOAT, d DOUBLE, s STRING, dec DECIMAL(4,2)) STORED AS ORC;
INSERT INTO g998_pred
  SELECT CAST(n_nationkey % 64 AS TINYINT),
         CAST(n_nationkey * 11 AS SMALLINT),
         CAST(n_nationkey * 101 AS INT),
         CAST(n_nationkey * 10001 AS BIGINT),
         CAST(n_nationkey / 4.0 AS FLOAT),
         n_nationkey / 8.0,
         n_name,
         CAST(n_nationkey % 100 AS DECIMAL(4,2))
  FROM nation;
SELECT (SELECT count(*) FROM g998_pred WHERE t > 10 AND t < 20) AS t_rng,
       (SELECT count(*) FROM g998_pred WHERE si >= 110 AND si <= 220) AS si_rng,
       (SELECT count(*) FROM g998_pred WHERE i != 505) AS i_ne,
       (SELECT count(*) FROM g998_pred WHERE b > 100010) AS b_gt,
       (SELECT count(*) FROM g998_pred WHERE f < 2.5) AS f_lt,
       (SELECT count(*) FROM g998_pred WHERE d BETWEEN 0.5 AND 2.0) AS d_bw,
       (SELECT count(*) FROM g998_pred WHERE s LIKE '%A%') AS s_like,
       (SELECT count(*) FROM g998_pred
          WHERE s BETWEEN 'ALGERIA' AND 'JAPAN') AS s_bw,
       (SELECT count(*) FROM g998_pred WHERE dec > 10) AS dec_gt
