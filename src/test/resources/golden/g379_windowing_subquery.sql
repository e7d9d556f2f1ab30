-- windowing.q t6: the same windowed select consumed through a subquery
SELECT sub1.r, sub1.dr, sub1.s1, sub1.deltaSz
FROM (SELECT p_brand, p_name,
  rank() over(distribute by p_brand sort by p_name, p_partkey) as r,
  dense_rank() over(distribute by p_brand sort by p_name, p_partkey) as dr,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between unbounded preceding and current row) * 100) / 100 as s1,
  p_size - lag(p_size,1,p_size) over(distribute by p_brand sort by p_name, p_partkey) as deltaSz
FROM part) sub1
