-- join_array.q: equi-join where the key is an ARRAY value (the
-- reference compares via ObjectInspector deep equality; Spark compares
-- orderable complex types natively).
SELECT a.id AS a_id, b.id AS b_id, a.k
FROM (SELECT n_nationkey AS id, array(n_regionkey, n_regionkey * 2) AS k
      FROM nation WHERE n_nationkey < 6) a
JOIN (SELECT n_nationkey AS id, array(n_regionkey, n_regionkey * 2) AS k
      FROM nation WHERE n_nationkey < 10) b
  ON a.k = b.k AND a.id < b.id
ORDER BY a_id, b_id;
