-- reference: ql/src/test/queries/clientnegative/joinneg.q — a join
-- condition naming an alias (b) that no side defines refuses.
-- ERROR-CONTAINS: b | cannot be resolved | unresolved
FROM (SELECT nation.* FROM nation) x
JOIN (SELECT nation.* FROM nation) y
  ON (x.n_nationkey = b.n_nationkey)
SELECT y.*;
