-- regex_col.q: SET hive.support.quoted.identifiers=none turns backquoted
-- identifiers into SELECT-list column regexes. Mapped onto Spark's
-- identical quotedRegexColumnNames feature; the view captures the
-- regex-expanded projection, then the conf flips back so ordinary
-- backquoted identifiers (quotedid goldens) keep working.
SET hive.support.quoted.identifiers=none;
DROP VIEW IF EXISTS g319_v;
CREATE TEMPORARY VIEW g319_v AS
  SELECT `(n_nationkey|n_name)` FROM nation WHERE n_nationkey < 3;
SET hive.support.quoted.identifiers=column;
SELECT * FROM g319_v ORDER BY n_nationkey;
