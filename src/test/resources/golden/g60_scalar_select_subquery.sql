SELECT r_name,
       (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS n_nations
FROM region r
