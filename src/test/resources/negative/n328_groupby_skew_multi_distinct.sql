-- reference: ql/src/test/queries/clientnegative/
-- groupby2_multi_distinct.q + groupby3_multi_distinct.q (and
-- groupby2_map_skew_multi_distinct.q +
-- groupby3_map_skew_multi_distinct.q, the
-- *_map_skew_multi_distinct variants) — more than one DISTINCT
-- aggregate with hive.groupby.skewindata=true refuses (Error 10022:
-- the two-stage skew rewrite can spray only one distinct key).
-- ERROR-CONTAINS: 10022 | skew in data
set hive.map.aggr=false;
set hive.groupby.skewindata=true;
SELECT substr(n_name, 1, 1),
       count(DISTINCT n_regionkey),
       sum(DISTINCT n_nationkey)
FROM nation GROUP BY substr(n_name, 1, 1);
