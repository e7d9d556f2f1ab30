-- windowing.q t5: rank/dense_rank/count/sum-frame/lag-with-default battery
-- in Hive's over(distribute by .. sort by ..) dialect (PTFTranslator maps
-- DISTRIBUTE/SORT onto PARTITION/ORDER inside a window spec)
SELECT p_brand, p_name,
  rank() over(distribute by p_brand sort by p_name, p_partkey) as r,
  dense_rank() over(distribute by p_brand sort by p_name, p_partkey) as dr,
  count(p_size) over(distribute by p_brand sort by p_name, p_partkey) as cd,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between unbounded preceding and current row) * 100) / 100 as s1,
  p_size,
  p_size - lag(p_size,1,p_size) over(distribute by p_brand sort by p_name, p_partkey) as deltaSz
FROM part
