-- ppd_gby.q: a WHERE over a grouped subquery — the group-key predicate
-- pushes below the aggregation, the aggregate predicate stays above.
SELECT b.seg AS seg, b.cnt AS cnt
FROM (
  SELECT c_mktsegment AS seg, count(1) AS cnt, max(c_acctbal) AS mx
  FROM customer GROUP BY c_mktsegment
) b
WHERE b.seg > 'B' AND b.cnt > 10
