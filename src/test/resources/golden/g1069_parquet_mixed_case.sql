-- reference: ql/src/test/queries/clientpositive/parquet_mixed_case.q —
-- mixed-case column names declared on a parquet table resolve
-- case-insensitively at read (all-lowercase select list).
DROP TABLE IF EXISTS g1069_mixed;
CREATE TABLE g1069_mixed (
  lowerCase STRING,
  UPPERcase STRING,
  stats BIGINT,
  MORELOWERCASE STRING
) STORED AS PARQUET;
INSERT INTO g1069_mixed
  SELECT n_name, upper(n_name), CAST(n_nationkey AS BIGINT), lower(n_name)
  FROM nation WHERE n_nationkey < 6;
SELECT lowercase, uppercase, stats, morelowercase FROM g1069_mixed
