-- char_pad_convert.q: lpad/rpad convert NON-STRING arguments — numeric
-- first arguments stringify, and a numeric PAD argument stringifies
-- into the fill pattern.
SELECT lpad(CAST(n_nationkey AS TINYINT), 4, ' ') AS l1,
       lpad(CAST(n_nationkey AS SMALLINT), 2, ' ') AS l2,
       lpad(CAST(n_nationkey AS INT), 9, 'z') AS l3,
       lpad(CAST(n_nationkey AS BIGINT), 2, 'a') AS l4,
       lpad('oh', 10, CAST(n_nationkey AS TINYINT)) AS l5,
       lpad('my', 6, CAST(n_nationkey AS SMALLINT)) AS l6,
       rpad('other', 14, CAST(n_nationkey AS INT)) AS r1,
       rpad('one', 12, CAST(n_nationkey AS BIGINT)) AS r2
FROM nation WHERE n_nationkey IN (0, 7, 19)
