-- reference: ql/src/test/queries/clientnegative/create_or_replace_view5.q
-- (+ create_or_replace_view6.q, create_or_replace_view7.q,
-- create_or_replace_view8.q: the partitioned-view family) — CREATE OR
-- REPLACE VIEW together with IF NOT EXISTS is contradictory and
-- refuses.
-- ERROR-CONTAINS: IF NOT EXISTS | REPLACE | not allowed
CREATE OR REPLACE VIEW IF NOT EXISTS neg361_v AS
  SELECT n_nationkey FROM nation;
