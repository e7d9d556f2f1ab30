-- reference: ql/src/test/queries/clientnegative/protectmode_tbl1.q
-- (+ tbl2/tbl3/tbl4: partitioned and desc-extended variants) — after
-- ALTER TABLE ... ENABLE OFFLINE, any query against the table is
-- refused (error 10113) until DISABLE OFFLINE.
-- ERROR-CONTAINS: offline table or partition
DROP TABLE IF EXISTS neg_pm_off;
CREATE TABLE neg_pm_off (col STRING) USING parquet;
SELECT * FROM neg_pm_off;
ALTER TABLE neg_pm_off ENABLE OFFLINE;
SELECT * FROM neg_pm_off;
