-- windowing_range_multiorder.q: RANGE frames with MULTI-column ORDER BY
-- are legal for unbounded/current-row bounds (peer rows defined by the
-- whole ordering tuple).
SELECT n_regionkey, n_nationkey,
       count(*) OVER (PARTITION BY n_regionkey
                      ORDER BY n_nationkey % 2, n_name
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
       sum(n_nationkey) OVER (ORDER BY n_regionkey, n_nationkey % 3
                              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
FROM nation WHERE n_nationkey < 10
ORDER BY n_regionkey, n_nationkey;
