-- clientpositive/ptf_general_queries.q case 1 (testNoPTFNoWindowing):
-- DISTRIBUTE BY + SORT BY with no window function at all.
SELECT p_brand, p_name, p_size
FROM part
DISTRIBUTE BY p_brand
SORT BY p_brand, p_name;
