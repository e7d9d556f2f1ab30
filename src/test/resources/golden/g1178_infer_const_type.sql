-- reference: ql/src/test/queries/clientpositive/infer_const_type.q —
-- comparisons between narrow columns and constants WIDER than the
-- column type: tinyint vs 300 never matches, equality after the
-- constant folds into range, and string-vs-number coercion.
DROP TABLE IF EXISTS g1178_t;
CREATE TABLE g1178_t (ti TINYINT, si SMALLINT, i INT, s STRING) USING parquet;
INSERT INTO g1178_t VALUES
  (127, 32767, 100, '100'), (1, 2, 3, '3');
SELECT
  (SELECT count(*) FROM g1178_t WHERE ti = 300) AS ti_overflow,
  (SELECT count(*) FROM g1178_t WHERE ti = 127) AS ti_edge,
  (SELECT count(*) FROM g1178_t WHERE si = 40000) AS si_overflow,
  (SELECT count(*) FROM g1178_t WHERE s = 100) AS s_vs_num,
  (SELECT count(*) FROM g1178_t WHERE i = '3') AS i_vs_str
