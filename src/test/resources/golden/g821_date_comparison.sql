-- date_comparison.q: every comparison operator over equal, earlier and
-- later DATE literals in one row.
SELECT
  cast('2011-05-06' as date) >  cast('2011-05-06' as date) AS gt_eq,
  cast('2011-05-06' as date) <  cast('2011-05-06' as date) AS lt_eq,
  cast('2011-05-06' as date) =  cast('2011-05-06' as date) AS eq_eq,
  cast('2011-05-06' as date) <> cast('2011-05-06' as date) AS ne_eq,
  cast('2011-05-06' as date) >= cast('2011-05-06' as date) AS ge_eq,
  cast('2011-05-06' as date) <= cast('2011-05-06' as date) AS le_eq,
  cast('2011-05-05' as date) >  cast('2011-05-06' as date) AS gt_lt,
  cast('2011-05-05' as date) <  cast('2011-05-06' as date) AS lt_lt,
  cast('2011-05-07' as date) >= cast('2011-05-06' as date) AS ge_gt,
  cast('2011-05-07' as date) <= cast('2011-05-06' as date) AS le_gt
