-- clientpositive/ptf_streaming.q-shape: a running rows-frame the
-- reference streams through its PTF chain without buffering the whole
-- partition; big-partition running sums + moving window.
SELECT l_suppkey, l_orderkey,
  round(sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov3
FROM lineitem
WHERE l_suppkey < 5 AND l_orderkey < 2000;
