-- CREATE FUNCTION ... USING JAR with a STRUCT-OF-ARRAY GenericUDTF
-- (graftjar.JsonExplode): each forwarded row carries (name string,
-- nums array<int>, total int) through LATERAL VIEW — the nested return
-- shape beyond the simple (token, len) fixture.
DROP TEMPORARY FUNCTION IF EXISTS g775_json_kv;
CREATE TEMPORARY FUNCTION g775_json_kv AS 'graftjar.JsonExplode' USING JAR 'src/test/resources/jars/graft-hiveudf.jar';
SELECT n_nationkey, t.name, t.nums, t.total
FROM nation
LATERAL VIEW g775_json_kv(concat(n_name, ':', n_nationkey, ',', n_regionkey, '|tail:7')) t AS name, nums, total
WHERE n_nationkey < 5
