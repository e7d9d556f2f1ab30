-- udf_inline.q: inline() over a literal array-of-structs with and
-- without a LIMIT, named columns.
SELECT id, text FROM (
  SELECT inline(array(
    struct(1, 'dude!'),
    struct(2, 'Wheres'),
    struct(3, 'my car?')
  )) AS (id, text)
) t WHERE id <= 2
