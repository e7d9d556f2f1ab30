SELECT event_id, ts + INTERVAL 1 HOUR AS t1, ts - INTERVAL 30 MINUTE AS t2,
  CAST(ts AS DATE) AS d, hour(ts) AS h, minute(ts) AS m
FROM events WHERE event_id < 10
