-- windowing.q delta chains: lag feeding arithmetic and coalesce/nvl
SELECT p_brand, p_name,
  round((p_retailprice - coalesce(lag(p_retailprice) over w, p_retailprice)) * 100) / 100 as delta,
  round(nvl(lead(p_retailprice) over w, 0.0) * 100) / 100 as nxt
FROM part
window w as (distribute by p_brand sort by p_name, p_partkey)
