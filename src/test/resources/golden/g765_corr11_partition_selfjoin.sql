-- correlationoptimizer11.q: self-join of a partitioned table where each
-- side pins a DIFFERENT partition, grouped on the join key.
DROP TABLE IF EXISTS g765_pt;
CREATE TABLE g765_pt (key STRING, value STRING) PARTITIONED BY (partitionId INT);
INSERT OVERWRITE TABLE g765_pt PARTITION (partitionId=1)
  SELECT cast(c_nationkey AS STRING), c_name FROM customer ORDER BY 1, 2 LIMIT 100;
INSERT OVERWRITE TABLE g765_pt PARTITION (partitionId=2)
  SELECT cast(n_nationkey AS STRING), n_name FROM nation;
SELECT x.key AS key, count(1) AS cnt
FROM g765_pt x JOIN g765_pt y ON x.key = y.key
WHERE x.partitionId = 1 AND y.partitionId = 2
GROUP BY x.key
