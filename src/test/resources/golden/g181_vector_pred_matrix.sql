-- vectorization_short_regress.q semantics: nested boolean predicate matrix
SELECT l_returnflag, count(*) AS n FROM lineitem
WHERE ((l_quantity BETWEEN 5 AND 45) AND NOT (l_returnflag = 'A' OR l_linestatus <> 'F'))
   OR (l_discount IS NOT NULL AND (l_tax < 0.05 OR l_linestatus IN ('F', 'O')))
GROUP BY l_returnflag
