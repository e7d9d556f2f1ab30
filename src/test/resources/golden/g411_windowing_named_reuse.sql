-- one named window reused by several aggregates (windowing.q w1 reuse)
SELECT p_brand, p_name,
  min(p_size) over w1 as mn,
  max(p_size) over w1 as mx,
  round(avg(p_retailprice) over w1 * 100) / 100 as av
FROM part
window w1 as (distribute by p_brand sort by p_name, p_partkey
  rows between 2 preceding and 2 following)
