-- array_map_access_nonconstant.q: indexing an array with a COLUMN (not
-- a literal), and a map with a computed key — out-of-range array index
-- yields NULL, missing map key yields NULL.
DROP TABLE IF EXISTS g893_am;
CREATE TABLE g893_am (idx INT, arr ARRAY<STRING>, mkey STRING,
  mp MAP<STRING, INT>) USING parquet;
INSERT INTO g893_am VALUES
  (0, array('a','b','c'), 'x', map('x', 1, 'y', 2)),
  (2, array('a','b','c'), 'y', map('x', 1, 'y', 2)),
  (5, array('a','b','c'), 'z', map('x', 1, 'y', 2));
SELECT idx, arr[idx] AS elem, mp[mkey] AS mval, mp[concat('', mkey)] AS mval2
FROM g893_am ORDER BY idx
