-- vectorization_14.q shape: aggregates grouped by expressions over a
-- timestamp-derived key (events table; ts already micros-converted).
SELECT HOUR(ts) % 4 AS hgrp, event_type,
  COUNT(*) AS n,
  ROUND(SUM(value) * 100) / 100 AS sum_v,
  ROUND(MAX(value) * 100) / 100 AS max_v
FROM events
WHERE user_id % 10 = 3
GROUP BY HOUR(ts) % 4, event_type
