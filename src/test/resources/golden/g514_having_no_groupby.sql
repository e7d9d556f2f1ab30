-- having.q edge: HAVING without GROUP BY applies to the implicit global
-- aggregate; both the passing and filtered-out cases.
SELECT 'pass' AS tag, cast(c AS STRING) AS v FROM (
  SELECT count(1) AS c FROM nation HAVING count(1) > 10
) a
UNION ALL
SELECT 'filtered', cast(c AS STRING) FROM (
  SELECT count(1) AS c FROM nation HAVING count(1) > 9999
) b
