-- sample8.q shape: TABLESAMPLE(BUCKET x OUT OF y ON col) on both sides of
-- a join — deterministic hash-bucket sampling composes under joins.
SELECT s.s_suppkey AS sk, c.c_custkey AS ck
FROM supplier TABLESAMPLE (BUCKET 1 OUT OF 4 ON s_suppkey) s
JOIN customer TABLESAMPLE (BUCKET 1 OUT OF 10 ON c_custkey) c
  ON s.s_nationkey = c.c_nationkey
WHERE s.s_suppkey < 40 AND c.c_custkey < 100
