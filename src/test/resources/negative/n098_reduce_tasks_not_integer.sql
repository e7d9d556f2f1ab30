-- the mapred.reduce.tasks bridge validates its value: a non-integer
-- reducer count is refused loudly instead of silently ignored
-- ERROR-CONTAINS: expects an integer
SET mapred.reduce.tasks=lots;
