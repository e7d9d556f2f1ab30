-- windowing_adjust_rowcontainer_sz.q: a frame far wider than any partition
SELECT p_brand, p_name,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between 100 preceding and 100 following) * 100) / 100 as s
FROM part
