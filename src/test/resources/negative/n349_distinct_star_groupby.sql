-- reference: ql/src/test/queries/clientnegative/selectDistinctStarNeg_2.q
-- — SELECT DISTINCT * together with GROUP BY refuses: star expansion
-- includes non-grouped columns.
-- ERROR-CONTAINS: group by | GROUP BY | grouping
SELECT DISTINCT * FROM nation GROUP BY n_nationkey;
