-- double windowing: rank over the output of a windowed sum (two layers)
SELECT p_brand, p_name, s1,
  rank() over (partition by p_brand order by s1 desc, p_name) as r_of_sum
FROM (
  SELECT p_brand, p_name,
    round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
      rows between unbounded preceding and current row) * 100) / 100 as s1
  FROM part
) inner_q
