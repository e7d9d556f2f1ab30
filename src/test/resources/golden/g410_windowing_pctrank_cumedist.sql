-- percent_rank / cume_dist battery in Hive dialect
SELECT p_brand, p_name,
  round(percent_rank() over(distribute by p_brand sort by p_size, p_partkey) * 1000000) / 1000000 as pr,
  round(cume_dist() over(distribute by p_brand sort by p_size) * 1000000) / 1000000 as cd
FROM part
