-- subquery_unqualcolumnrefs.q: correlated IN whose subquery mixes
-- UNQUALIFIED inner columns with an outer correlation, over a ranked
-- window derived table (the reference's min-of-top-2-sizes-per-mfgr).
SELECT p_brand, p_name, p_size
FROM part b WHERE b.p_size IN
  (SELECT min(p_size)
   FROM (SELECT p_brand, p_size,
                rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS r
         FROM part) a
   WHERE r <= 2 AND b.p_brand = p_brand)
