-- ppd_constant_where.q + the round-10 StringBooleanCast rule: WHERE over
-- a string flag column keeps rows with ANY non-empty value ('false' and
-- '0' included), drops '' and NULL.
DROP TABLE IF EXISTS g622_f;
CREATE TABLE g622_f USING parquet AS
  SELECT n_nationkey AS k,
    CASE WHEN n_nationkey % 5 = 0 THEN 'true'
         WHEN n_nationkey % 5 = 1 THEN 'false'
         WHEN n_nationkey % 5 = 2 THEN '0'
         WHEN n_nationkey % 5 = 3 THEN ''
         ELSE CAST(NULL AS STRING) END AS flag
  FROM nation;
SELECT COUNT(*) AS n_kept, MIN(k) AS min_k FROM g622_f WHERE CAST(flag AS BOOLEAN)
