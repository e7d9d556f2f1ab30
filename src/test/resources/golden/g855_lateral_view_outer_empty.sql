-- lateral_view_outer.q: LATERAL VIEW OUTER over an EMPTY array keeps
-- the driving row with a NULL generated column; over a NULL-valued
-- array column the same; over a populated array it multiplies rows.
DROP TABLE IF EXISTS g855_av;
CREATE TABLE g855_av USING parquet AS
SELECT n_nationkey AS key,
       IF(n_nationkey > 20, array(n_name, n_name), NULL) AS value
FROM nation;
SELECT 'empty' AS tag, n_nationkey, CAST(a AS STRING) AS a
FROM nation LATERAL VIEW OUTER explode(array()) c AS a
WHERE n_nationkey < 3
UNION ALL
SELECT 'vals', n_nationkey, CAST(a AS STRING)
FROM nation LATERAL VIEW OUTER explode(array(4,5)) c AS a
WHERE n_nationkey < 3
UNION ALL
SELECT 'col', key, CAST(a AS STRING)
FROM g855_av LATERAL VIEW OUTER explode(value) c AS a
WHERE key > 18
