-- reference: ql/src/test/queries/clientnegative/create_table_failure1.q
-- (+ create_table_failure2.q, create_table_failure4.q) — CREATE TABLE
-- (plain or CTAS) into a database that does
-- not exist refuses.
-- ERROR-CONTAINS: not found | does not exist | schema
CREATE TABLE neg337_db_missing.test AS
  SELECT n_nationkey FROM nation LIMIT 1;
