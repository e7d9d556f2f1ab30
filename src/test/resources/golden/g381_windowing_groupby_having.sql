-- windowing.q t3: GROUP BY + HAVING + windowing over the aggregated rows
SELECT p_brand, p_name, p_size, round(min(p_retailprice) * 100) / 100 as mn,
  rank() over(distribute by p_brand sort by p_name, p_size) as r,
  dense_rank() over(distribute by p_brand sort by p_name, p_size) as dr,
  p_size - lag(p_size,1,p_size) over(distribute by p_brand sort by p_name, p_size) as deltaSz
FROM part
GROUP BY p_brand, p_name, p_size
HAVING p_size > 10
