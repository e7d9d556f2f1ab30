-- windowing.q t16-t20: the ROWS frame matrix over one partition spec
SELECT p_brand, p_name,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between 1 preceding and current row) * 100) / 100 as s_1p_cur,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between current row and 1 following) * 100) / 100 as s_cur_1f,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between 2 preceding and 2 following) * 100) / 100 as s_2p_2f,
  round(sum(p_retailprice) over (distribute by p_brand sort by p_name, p_partkey
    rows between unbounded preceding and unbounded following) * 100) / 100 as s_all
FROM part
