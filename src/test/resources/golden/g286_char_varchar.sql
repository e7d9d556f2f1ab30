-- char/varchar CAST semantics: Spark keeps plain-string behavior on casts
-- (no truncation to VARCHAR(n), no CHAR blank-pad outside table reads) —
-- a documented divergence from Hive's serde-level enforcement; length
-- checks apply on datasource WRITES instead
SELECT CAST('abcdef' AS VARCHAR(4)) AS vc_trunc,
       CAST('ab' AS CHAR(5)) AS ch_pad,
       length(CAST('ab' AS CHAR(5))) AS ch_len,
       CAST('ab' AS CHAR(5)) = 'ab' AS ch_eq,
       concat(CAST('ab' AS CHAR(4)), '|') AS ch_concat
FROM region WHERE r_regionkey = 0
