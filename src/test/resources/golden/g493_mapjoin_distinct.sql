-- mapjoin_distinct.q: DISTINCT over a mapjoin-hinted join, both with and
-- without a map-side-aggregation toggle.
set hive.map.aggr=true;
SELECT /*+ MAPJOIN(r) */ DISTINCT n.n_regionkey, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
