-- SQL-text event-time windows over the events fixture (window/session_window)
SELECT date_format(w.start, 'yyyy-MM-dd HH:mm') AS ws, event_type, count(*) AS n
FROM (SELECT window(ts, '6 hours') AS w, event_type FROM events) t
GROUP BY w.start, event_type
HAVING count(*) > 50
