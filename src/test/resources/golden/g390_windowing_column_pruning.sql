-- windowing_columnPruning.q: only the window output projected — the scan
-- must prune to the partition/order/argument columns
SELECT rank() over (partition by c_mktsegment order by c_acctbal, c_custkey) as r
FROM customer WHERE c_custkey <= 200
