-- ptf.q test 2 shape: noop over a join subquery with DISTRIBUTE/SORT BY
SELECT p_brand, p_name, p_size,
       p_size - lag(p_size, 1, p_size) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS deltasz
FROM noop (on (select p1.* from part p1 join part p2 on p1.p_partkey = p2.p_partkey) j
distribute by j.p_brand
sort by j.p_name)
