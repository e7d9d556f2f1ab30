-- every clientpositive .q opens with hive.* SET lines; they must be inert
set hive.map.aggr=true;
set hive.groupby.skewindata=false;
set hive.stats.autogather=false;
set mapred.reduce.tasks=31;
SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus
