-- reference: ql/src/test/queries/clientpositive/compute_stats_boolean.q
-- + compute_stats_long.q + compute_stats_double.q +
-- compute_stats_string.q + compute_stats_decimal.q +
-- compute_stats_empty_table.q — the NDV-sketch compute_stats() UDAF
-- over every primitive family, plus the empty-table zero rows shape.
DROP TABLE IF EXISTS g1085_t;
DROP TABLE IF EXISTS g1085_empty;
CREATE TABLE g1085_t USING parquet AS
  SELECT n_nationkey % 2 = 0 AS b,
         CAST(n_nationkey AS BIGINT) AS l,
         CAST(n_nationkey AS DOUBLE) / 4 AS d,
         n_name AS s,
         CAST(n_nationkey AS DECIMAL(10,3)) / 8 AS dec
  FROM nation;
CREATE TABLE g1085_empty (a BOOLEAN, b BIGINT, c DOUBLE, d STRING) USING parquet;
SELECT
  compute_stats(b, 16) AS st_bool,
  compute_stats(l, 16) AS st_long,
  compute_stats(d, 16) AS st_double,
  compute_stats(s, 16) AS st_string,
  compute_stats(dec, 18) AS st_decimal,
  (SELECT compute_stats(a, 16) FROM g1085_empty) AS st_empty_bool,
  (SELECT compute_stats(b, 16) FROM g1085_empty) AS st_empty_long
FROM g1085_t
