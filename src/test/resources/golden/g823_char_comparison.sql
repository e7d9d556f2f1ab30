-- char_comparison.q: CHAR(n) comparisons ignore the blank padding —
-- equal content compares equal across DIFFERENT declared lengths.
SELECT
  cast('abc' as char(10)) =  cast('abc' as char(3))  AS eq_mixed,
  cast('abc' as char(10)) <= cast('abc' as char(3))  AS le_mixed,
  cast('abc' as char(10)) >= cast('abc' as char(3))  AS ge_mixed,
  cast('abc' as char(10)) <  cast('abd' as char(3))  AS lt_mixed,
  cast('abc' as char(10)) >  cast('abb' as char(3))  AS gt_mixed,
  cast('abc' as char(10)) <> cast('abb' as char(3))  AS ne_mixed
