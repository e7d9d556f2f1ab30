-- order_within_subquery.q: ORDER BY + LIMIT inside a joined derived
-- table (the order feeds the limit, then joins back to the full table;
-- p_partkey added to the sort for a deterministic top-10).
SELECT t1.p_name AS n1, t2.p_name AS n2
FROM (SELECT * FROM part ORDER BY p_size, p_partkey LIMIT 10) t1
JOIN part t2 ON t1.p_partkey = t2.p_partkey AND t1.p_size = t2.p_size
WHERE t1.p_partkey < 100000
