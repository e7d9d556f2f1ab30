-- reference: ql/src/test/queries/clientpositive/udaf_percentile.q +
-- udaf_collect_set.q + udaf_number_format.q — exact percentile at a
-- fractional quantile, collect_set/collect_list (sorted for
-- stability), and the numeric aggregates over an UNPARSEABLE string
-- (sum('a') = NULL-ish 0.0/NULL per Hive's double coercion).
SELECT
  (SELECT percentile(CAST(n_nationkey AS BIGINT), 0.3) FROM nation) AS p30,
  (SELECT percentile(CAST(n_nationkey AS BIGINT), array(0.0, 0.5, 1.0))[1]
   FROM nation) AS p50,
  (SELECT CAST(sort_array(collect_set(n_regionkey)) AS STRING)
   FROM nation) AS cset,
  (SELECT size(collect_list(n_regionkey)) FROM nation) AS clist_n,
  (SELECT sum('a') FROM nation) AS sum_str,
  (SELECT avg('a') FROM nation) AS avg_str
