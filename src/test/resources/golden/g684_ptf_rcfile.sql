-- ptf_rcfile.q: windowing PTF (noop wrapper, rank/dense_rank/running
-- sum) over a part table stored on the RCFile container. p_mfgr /
-- p_container / p_comment are synthesized (the sf fixture part table
-- carries only the 6-column core).
DROP TABLE IF EXISTS g684_part_rc;
CREATE TABLE g684_part_rc (
  p_partkey INT, p_name STRING, p_mfgr STRING, p_brand STRING,
  p_type STRING, p_size INT, p_container STRING,
  p_retailprice DOUBLE, p_comment STRING) STORED AS RCFILE;
INSERT OVERWRITE TABLE g684_part_rc
  SELECT p_partkey, p_name, concat('Manufacturer#', 1 + p_partkey % 5),
         p_brand, p_type, p_size, 'JUMBO BOX', p_retailprice, 'none'
  FROM part WHERE p_partkey <= 60;
SELECT p_mfgr, p_name, p_size,
rank() over (partition by p_mfgr order by p_name) as r,
dense_rank() over (partition by p_mfgr order by p_name) as dr,
sum(p_retailprice) over (partition by p_mfgr order by p_name rows between unbounded preceding and current row) as s1
from noop(on g684_part_rc
partition by p_mfgr
order by p_name)
