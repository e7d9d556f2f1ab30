-- reference: ql/src/test/queries/clientnegative/duplicate_alias_in_transform.q
-- a TRANSFORM output schema naming the SAME alias twice makes every
-- later reference ambiguous and is refused at analysis.
-- ERROR-CONTAINS: ambiguous | duplicate | COLUMN_ALREADY_EXISTS | foo
SELECT foo FROM (
  SELECT TRANSFORM (n_nationkey, n_name) USING 'cat' AS (foo, foo)
  FROM nation
) t;
