-- windowing.q t7 (minus the noop PTF): windowing computed over join output
SELECT p1.p_brand, p1.p_name,
  rank() over(distribute by p1.p_brand sort by p1.p_name, p1.p_partkey) as r,
  round(sum(p1.p_retailprice) over (distribute by p1.p_brand sort by p1.p_name, p1.p_partkey
    rows between unbounded preceding and current row) * 100) / 100 as s1
FROM part p1 JOIN part p2 ON p1.p_partkey = p2.p_partkey
