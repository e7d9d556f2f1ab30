-- varchar_comparison.q: VARCHAR(n) comparisons across equal and
-- DIFFERENT declared lengths (varchar never pads, so content decides).
SELECT
  cast('abc' as varchar(10)) =  cast('abc' as varchar(3)) AS eq_mixed,
  cast('abc' as varchar(10)) <= cast('abc' as varchar(3)) AS le_mixed,
  cast('abc' as varchar(10)) >= cast('abc' as varchar(3)) AS ge_mixed,
  cast('abc' as varchar(10)) <  cast('abd' as varchar(3)) AS lt_mixed,
  cast('abc' as varchar(10)) >  cast('abb' as varchar(3)) AS gt_mixed,
  cast('abc' as varchar(10)) <> cast('abb' as varchar(3)) AS ne_mixed
