-- allcolref_in_udf.q: star expansion INSIDE function arguments —
-- concat(*) expands every column of the (narrow) input in order, and a
-- qualified a.* expands just that side of a join.
SELECT concat(*) AS allcat
FROM (SELECT r_regionkey, r_name FROM region) r
ORDER BY allcat LIMIT 3
