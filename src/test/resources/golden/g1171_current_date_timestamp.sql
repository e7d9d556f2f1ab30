-- reference: ql/src/test/queries/clientpositive/current_date_timestamp.q
-- — current_date/current_timestamp are per-query constants: they agree
-- with each other across rows and with unix_timestamp()'s epoch.
SELECT
  (SELECT count(DISTINCT current_timestamp()) FROM nation) AS one_value,
  current_date = CAST(current_timestamp AS DATE) AS date_of_ts,
  year(current_date) >= 2026 AS year_sane,
  unix_timestamp() > 1700000000 AS epoch_sane,
  to_date(current_timestamp) = current_date AS to_date_agrees
FROM nation TABLESAMPLE (1 ROWS)
