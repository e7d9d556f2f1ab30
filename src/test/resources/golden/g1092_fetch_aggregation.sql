-- reference: ql/src/test/queries/clientpositive/fetch_aggregation.q —
-- the single-pass aggregate battery under hive.fetch.task.aggr:
-- count/sum/avg/min/max/std/variance in one scan.
set hive.fetch.task.aggr=true;
SELECT count(n_nationkey) AS c, sum(n_nationkey) AS s,
       avg(n_nationkey) AS a, min(n_nationkey) AS mn,
       max(n_nationkey) AS mx,
       round(std(n_nationkey), 6) AS sd,
       round(variance(n_nationkey), 6) AS va
FROM nation
