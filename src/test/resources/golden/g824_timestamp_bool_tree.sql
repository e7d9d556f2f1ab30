-- timestamp_comparison2.q: a deep AND/OR predicate tree mixing
-- timestamp comparisons against numeric epochs with numeric and LIKE
-- branches, aggregated to a count.
SELECT count(*) AS n
FROM events
WHERE (user_id != 0)
  AND (((ts <= timestamp'1970-01-01 00:00:00')
          OR ((user_id = event_id) OR (event_type LIKE '%ick%')))
       AND ((988888 < value)
            OR ((ts > timestamp'1969-12-31 15:55:29') AND (3569 >= value))))
