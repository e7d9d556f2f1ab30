-- touch.q + show_locks: ALTER TABLE TOUCH is a hook/mtime no-op
-- (DDLSemanticAnalyzer analyzeAlterTableTouch); SHOW LOCKS answers an
-- empty listing when no lock manager is configured
-- (hive.support.concurrency=false, the reference default).
DROP TABLE IF EXISTS g333_t;
CREATE TABLE g333_t (k INT) USING parquet;
INSERT INTO g333_t VALUES (1);
ALTER TABLE g333_t TOUCH;
SHOW LOCKS g333_t;
