-- reference: ql/src/test/queries/clientnegative/regex_col_1.q
-- a backtick regex column is an ordinary (missing) identifier while
-- hive.support.quoted.identifiers=column (quotedRegexColumnNames off)
-- ERROR-CONTAINS: UNRESOLVED_COLUMN | cannot be resolved | cannot resolve
SET hive.support.quoted.identifiers=column;
SELECT `(n_name|n_comment)` FROM nation;
