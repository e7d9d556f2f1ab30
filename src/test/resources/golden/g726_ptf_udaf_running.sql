-- ptf_general_queries.q case 2 (testUDAFsNoWindowingNoPTFNoGBY): four
-- running UDAFs over the same default frame.
SELECT p_brand, p_name, p_retailprice,
  round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name), 2) AS s,
  min(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name) AS mi,
  max(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name) AS ma,
  round(avg(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_name), 2) AS av
FROM part
WHERE p_partkey < 60;
