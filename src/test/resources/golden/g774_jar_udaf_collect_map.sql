-- CREATE FUNCTION ... USING JAR with a COLLECT-TO-MAP GenericUDAF
-- (graftjar.CollectToMap): a map<string,bigint> partial crosses the
-- shuffle through PARTIAL1 terminatePartial / FINAL merge. Entries are
-- sorted in SQL — map iteration order is not part of the contract.
DROP TEMPORARY FUNCTION IF EXISTS g774_collect_kv;
CREATE TEMPORARY FUNCTION g774_collect_kv AS 'graftjar.CollectToMap' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT r_key, sort_array(map_entries(m)) AS entries FROM (
  SELECT n_regionkey AS r_key, g774_collect_kv(n_name, n_nationkey) AS m
  FROM nation GROUP BY n_regionkey
) t
