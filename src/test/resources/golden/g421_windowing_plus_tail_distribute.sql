-- an ANSI window PLUS a query-tail DISTRIBUTE BY / SORT BY: the tail
-- tokens are a different operator and must survive the window rewrite
SELECT c_mktsegment, c_custkey,
  rank() over (partition by c_mktsegment order by c_acctbal desc, c_custkey) AS r
FROM customer WHERE c_custkey <= 120
DISTRIBUTE BY c_mktsegment SORT BY c_mktsegment, r
