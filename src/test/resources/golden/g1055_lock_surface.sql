-- reference: ql/src/test/queries/clientpositive/lock1.q + lock2.q — the
-- SHOW LOCKS / LOCK TABLE / UNLOCK TABLE surface under the default
-- concurrency=false contract: locks are accepted, SHOW LOCKS answers
-- (empty — no lock manager holds entries), and repeated LOCK/UNLOCK
-- cycles stay idempotent.
DROP TABLE IF EXISTS g1055_tstsrc;
CREATE TABLE g1055_tstsrc (key INT, value STRING) USING parquet;
INSERT OVERWRITE TABLE g1055_tstsrc SELECT n_nationkey, n_name FROM nation;
SHOW LOCKS;
SHOW LOCKS g1055_tstsrc;
LOCK TABLE g1055_tstsrc SHARED;
SHOW LOCKS g1055_tstsrc EXTENDED;
UNLOCK TABLE g1055_tstsrc;
LOCK TABLE g1055_tstsrc SHARED;
UNLOCK TABLE g1055_tstsrc;
SELECT count(*) AS n FROM g1055_tstsrc;
