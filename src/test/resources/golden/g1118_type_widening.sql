-- reference: ql/src/test/queries/clientpositive/type_widening.q — int →
-- bigint widening through COALESCE and through UNION ALL branch
-- reconciliation at Long.MaxValue.
SELECT
  (SELECT COALESCE(0, 9223372036854775807) FROM nation LIMIT 1) AS c,
  (SELECT max(numcol) FROM
    (SELECT 0 AS numcol FROM nation
     UNION ALL
     SELECT 9223372036854775807 AS numcol FROM nation) a) AS mx,
  (SELECT min(numcol) FROM
    (SELECT 0 AS numcol FROM nation
     UNION ALL
     SELECT 9223372036854775807 AS numcol FROM nation) a) AS mn
