-- join21.q verbatim shape: LEFT OUTER with ON-clause predicates on BOTH
-- sides' keys, then RIGHT OUTER with a predicate on the rightmost —
-- the ON-vs-WHERE null-extension goldmine.
SELECT src1.n_nationkey AS k1, src2.n_nationkey AS k2, src3.n_nationkey AS k3
FROM nation src1
LEFT OUTER JOIN nation src2
  ON (src1.n_nationkey = src2.n_nationkey AND src1.n_nationkey < 10 AND src2.n_nationkey > 10)
RIGHT OUTER JOIN nation src3
  ON (src2.n_nationkey = src3.n_nationkey AND src3.n_nationkey < 10)
WHERE src3.n_nationkey < 12
