-- ppd_field_garbage.q: field pruning through a VIEW with LATERAL VIEW
-- explode over array<struct>, selecting a nested struct field — the
-- WHERE on the nested field must not corrupt the pruned schema.
DROP VIEW IF EXISTS g850_v;
DROP TABLE IF EXISTS g850_t;
CREATE TABLE g850_t (fileid INT, infos ARRAY<STRUCT<user:INT>>,
  test_c STRUCT<user_c:STRUCT<age:INT>>) USING parquet;
INSERT INTO g850_t SELECT 1, array(named_struct('user', 7)),
  named_struct('user_c', named_struct('age', 25));
INSERT INTO g850_t SELECT 2, array(named_struct('user', 8), named_struct('user', 9)),
  named_struct('user_c', named_struct('age', 30));
CREATE VIEW g850_v AS SELECT fileid, i.user, test_c.user_c.age
FROM g850_t LATERAL VIEW explode(infos) info AS i;
SELECT * FROM g850_v WHERE age = 25
