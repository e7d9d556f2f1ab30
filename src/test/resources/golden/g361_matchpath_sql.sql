-- ptf_matchpath.q shape: the MatchPath PTF SQL-text invocation
-- (pattern, symbol/predicate pairs, result list with tpath expressions)
SELECT user_id, event_id, event_type, sz, path_first
FROM matchpath(on
        events
        distribute by user_id
        sort by ts, event_id
      arg1('HI.HI+'),
      arg2('HI'), arg3(value > 60),
    arg4('user_id, event_id, event_type, size(tpath) as sz, tpath[0].event_id as path_first')
   )
ORDER BY user_id, event_id
LIMIT 30
