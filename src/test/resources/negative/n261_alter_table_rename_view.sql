-- reference: ql/src/test/queries/clientnegative/alter_view_failure9.q
-- ALTER TABLE ... RENAME against a VIEW is refused toward ALTER VIEW
-- (10131).
-- ERROR-CONTAINS: To alter a view you need to use the ALTER VIEW command
DROP VIEW IF EXISTS neg_avf9_v;
DROP TABLE IF EXISTS neg_avf9_t;
CREATE TABLE neg_avf9_t (k INT) USING parquet;
CREATE VIEW neg_avf9_v AS SELECT k FROM neg_avf9_t;
ALTER TABLE neg_avf9_v RENAME TO neg_avf9_v2;
