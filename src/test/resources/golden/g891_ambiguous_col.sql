-- ambiguous_col.q (TOK_ALLCOLREF shape): selecting a.key alongside a.*
-- from a join of two derived tables — the duplicated column name is
-- legal and both copies surface.
SELECT * FROM (
  SELECT a.n_nationkey, a.*
  FROM (SELECT * FROM nation) a
  JOIN (SELECT * FROM region) b ON (a.n_regionkey = b.r_regionkey)
) t
ORDER BY 1 LIMIT 5
