-- session_window SQL text (30-minute gap), per-user session counts
SELECT user_id, count(*) AS n_sessions, sum(n_events) AS total_events FROM (
  SELECT session_window(ts, '30 minutes') AS sw, user_id, count(*) AS n_events
  FROM events WHERE user_id < 20
  GROUP BY session_window(ts, '30 minutes'), user_id) s
GROUP BY user_id
