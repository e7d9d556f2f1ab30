-- and the RIGHT JOIN mirror of g415
SELECT count(*) AS total, count(s_name) AS matched
FROM nation RIGHT JOIN supplier
  ON s_nationkey = n_nationkey AND s_acctbal > 5000
