-- cbo_subq_not_in.q: correlated NOT IN — parts whose name is not among
-- the small-size names of the SAME brand (the reference correlates on
-- p_mfgr; the fixture part table carries p_brand as the maker column).
SELECT p_brand, b.p_name, p_size
FROM part b
WHERE b.p_name NOT IN
  (SELECT p_name
   FROM (SELECT p_brand, p_name, p_size AS r FROM part) a
   WHERE r < 10 AND b.p_brand = a.p_brand)
  AND b.p_partkey < 60
