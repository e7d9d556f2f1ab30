-- windowing_columnPruning.q: window functions whose PARTITION columns
-- (distribute by p_mfgr sort by p_name) are NOT in the select list —
-- pruning must keep the window inputs alive; running sum over part.
SELECT p_size,
       round(sum(p_retailprice) OVER (DISTRIBUTE BY p_brand SORT BY p_name
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS s1
FROM part
WHERE p_partkey < 50
