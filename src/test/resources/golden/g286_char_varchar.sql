-- char/varchar CAST semantics: Spark keeps plain-string behavior on
-- bare casts (no truncation to VARCHAR(n), no CHAR blank-pad) — a
-- documented divergence from Hive's serde-level enforcement; length
-- checks apply on datasource WRITES instead. Since round 14, TABLE
-- reads of CHAR columns present Hive's STRIPPED value for function/
-- comparison semantics (HiveSemantics.CharStripReads, g562/g828/g829).
-- KNOWN DIVERGENCE (r14 advice): a BARE projection of a char column
-- displays the stripped value here, while the reference displays the
-- blank-padded form (char_1.q.out pads 'val_0' to the declared width)
-- - display-level only; length/concat/compare match the reference.
-- The other remaining divergence is cast-level truncation (Spark's preserveCharVarcharTypeInfo mode ERRORS on
-- overlong values rather than truncating, so Hive's silent truncate is
-- not reachable without rewriting user SQL).
SELECT CAST('abcdef' AS VARCHAR(4)) AS vc_trunc,
       CAST('ab' AS CHAR(5)) AS ch_pad,
       length(CAST('ab' AS CHAR(5))) AS ch_len,
       CAST('ab' AS CHAR(5)) = 'ab' AS ch_eq,
       concat(CAST('ab' AS CHAR(4)), '|') AS ch_concat
FROM region WHERE r_regionkey = 0
