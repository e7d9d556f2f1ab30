-- reference: ql/src/test/queries/clientpositive/udaf_corr.q +
-- udaf_covar_pop.q + udaf_covar_samp.q — corr/covar over empty,
-- single-row (NULL results), grouped, and whole-table inputs.
DROP TABLE IF EXISTS g1121_cv;
CREATE TABLE g1121_cv USING parquet AS
  SELECT CAST(n_nationkey % 3 AS INT) AS a,
         CAST(n_nationkey AS INT) AS b,
         CAST(n_nationkey * 2 + n_regionkey AS INT) AS c
  FROM nation;
SELECT
  (SELECT corr(b, c) FROM g1121_cv WHERE a < 0) AS corr_empty,
  (SELECT round(corr(b, c), 6) FROM g1121_cv) AS corr_all,
  (SELECT round(covar_pop(b, c), 6) FROM g1121_cv) AS cpop_all,
  (SELECT round(covar_samp(b, c), 6) FROM g1121_cv) AS csamp_all,
  (SELECT round(min(g), 6) FROM
     (SELECT corr(b, c) AS g FROM g1121_cv GROUP BY a) x) AS corr_grp_min
