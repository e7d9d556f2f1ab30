-- reference: ql/src/test/queries/clientpositive/union_lateralview.q — a
-- LATERAL VIEW EXPLODE over a UNION ALL, then a LEFT OUTER join back to
-- the base table, landed in a table.
DROP TABLE IF EXISTS g1119_t;
CREATE TABLE g1119_t (key INT, arr_ele INT, value STRING) USING parquet;
INSERT OVERWRITE TABLE g1119_t
SELECT b.n_nationkey, d.arr_ele, d.value
FROM (
  SELECT c.arr_ele AS arr_ele, a.key AS key, a.value AS value
  FROM (
    SELECT n_nationkey AS key, n_name AS value, array(1, 2, 3) AS arr
    FROM nation WHERE n_nationkey < 4
    UNION ALL
    SELECT n_nationkey, n_name, array(1, 2, 3)
    FROM nation WHERE n_nationkey BETWEEN 2 AND 5
  ) a LATERAL VIEW EXPLODE(arr) c AS arr_ele
) d
LEFT OUTER JOIN nation b ON d.key = b.n_nationkey;
SELECT key, arr_ele, value, count(*) AS dup FROM g1119_t
GROUP BY key, arr_ele, value
