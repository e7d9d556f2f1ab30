-- reference: ql/src/test/queries/clientnegative/merge_negative_2.q
-- with two MATCHED clauses, only the LAST may omit its condition
-- ERROR-CONTAINS: NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION | only the last MATCHED | unconditional
CREATE DATABASE IF NOT EXISTS graft_tmp;
DROP TABLE IF EXISTS graft_tmp.neg_mrg;
DROP TABLE IF EXISTS graft_tmp.neg_mrg_src;
CREATE TABLE graft_tmp.neg_mrg USING parquet LOCATION '${NEGTMP}/neg_mrg' AS SELECT 1 AS k, 'a' AS v;
CREATE TABLE graft_tmp.neg_mrg_src USING parquet LOCATION '${NEGTMP}/neg_mrg_src' AS SELECT 1 AS k, 'b' AS v;
MERGE INTO graft_tmp.neg_mrg t USING graft_tmp.neg_mrg_src s ON t.k = s.k
WHEN MATCHED THEN UPDATE SET v = s.v
WHEN MATCHED AND s.k > 3 THEN DELETE;
