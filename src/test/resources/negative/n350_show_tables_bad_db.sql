-- reference: ql/src/test/queries/clientnegative/show_tables_bad_db2.q —
-- SHOW TABLES FROM a nonexistent database refuses.
-- ERROR-CONTAINS: nonexistent | not found | does not exist
SHOW TABLES FROM neg350_nonexistent LIKE 'test';
