-- vectorized_casts.q: the cross-type cast matrix, end-to-end values
-- (our plans are whole-stage codegen'd — the Spark analogue of Hive's
-- vectorized row batches). Hive semantics pinned: numeric→boolean is
-- `v != 0`, boolean→int is 1/0, float→int TRUNCATES toward zero,
-- string→int is NULL on garbage, string→boolean is non-empty
-- (HiveSemantics.StringBooleanCast), timestamp→int is epoch seconds,
-- int→timestamp reads seconds.
DROP TABLE IF EXISTS g876_t;
CREATE TABLE g876_t (t TINYINT, si SMALLINT, i INT, b BIGINT,
  f FLOAT, d DOUBLE, bo BOOLEAN, s STRING, ts TIMESTAMP) USING parquet;
INSERT INTO g876_t VALUES
  (1, 2, 3, 4, 1.7, -2.9, true, '42', TIMESTAMP '2020-01-01 00:00:10'),
  (0, 0, 0, 0, 0.0, 0.0, false, 'not_a_number', TIMESTAMP '1970-01-01 00:00:00'),
  (-5, -6, -7, -8, -1.2, 3.5, true, '', TIMESTAMP '1999-12-31 23:59:59');
SELECT
  CAST(t AS BOOLEAN) AS t_bool, CAST(i AS BOOLEAN) AS i_bool,
  CAST(f AS BOOLEAN) AS f_bool, CAST(s AS BOOLEAN) AS s_bool,
  CAST(bo AS INT) AS bo_int, CAST(f AS INT) AS f_int,
  CAST(d AS INT) AS d_int, CAST(s AS INT) AS s_int,
  CAST(ts AS BIGINT) AS ts_epoch,
  CAST(t AS DOUBLE) AS t_dbl, CAST(bo AS DOUBLE) AS bo_dbl,
  CAST(f AS DOUBLE) AS f_dbl_raw,
  CAST(CAST(4 AS INT) AS TIMESTAMP) AS int_ts,
  CAST(i AS STRING) AS i_str, CAST(bo AS STRING) AS bo_str,
  CAST(f AS SMALLINT) AS f_si, CAST(d AS TINYINT) AS d_ti
FROM g876_t
