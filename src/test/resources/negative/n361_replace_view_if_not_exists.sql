-- reference: ql/src/test/queries/clientnegative/create_or_replace_view5.q
-- (+ _6, _7, _8: the partitioned-view redefinition family) — CREATE OR
-- REPLACE VIEW together with IF NOT EXISTS is contradictory and
-- refuses.
-- ERROR-CONTAINS: IF NOT EXISTS | REPLACE | not allowed
CREATE OR REPLACE VIEW IF NOT EXISTS neg361_v AS
  SELECT n_nationkey FROM nation;
