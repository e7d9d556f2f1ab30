-- subquery_notin.q: correlated aggregate NOT IN
SELECT p_brand, p_name, p_size FROM part b
WHERE b.p_size NOT IN (SELECT min(p_size) FROM part a WHERE b.p_brand = a.p_brand)
