-- reference: ql/src/test/queries/clientpositive/cast_qualified_types.q —
-- casts to the length/precision-qualified types decimal(10,2),
-- char(10), varchar(10) survive planning and ordering.
SELECT
  cast(n_nationkey AS DECIMAL(10,2)) AS c1,
  cast(n_name AS CHAR(10)) AS c2,
  cast(n_name AS VARCHAR(10)) AS c3
FROM nation
ORDER BY c1, c2, c3
LIMIT 3
