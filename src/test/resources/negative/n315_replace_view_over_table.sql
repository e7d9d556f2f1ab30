-- reference: ql/src/test/queries/clientnegative/create_or_replace_view3.q
-- — CREATE OR REPLACE VIEW naming an existing TABLE is refused: replace
-- only replaces views.
-- ERROR-CONTAINS: EXPECT_VIEW_NOT_TABLE | not support CREATE OR REPLACE VIEW | is a table
DROP TABLE IF EXISTS neg_crv3_t;
DROP TABLE IF EXISTS neg_crv3_base;
CREATE TABLE neg_crv3_t (i INT) USING parquet;
CREATE TABLE neg_crv3_base (i INT) USING parquet;
CREATE OR REPLACE VIEW neg_crv3_t AS SELECT i FROM neg_crv3_base;
