-- windowing.q t8: mixed-case alias, multi-key sort with DESC inside the spec
SELECT p_brand, p_name, p_size,
  rank() over(distribute by p_brand sort by p_name, p_size desc) as R
FROM part
