-- reference: ql/src/test/queries/clientpositive/inputddl5.q — utf-8
-- multibyte values survive storage and compare correctly against a
-- utf-8 literal (the reference loads kv4.txt holding 0xE982B5E993AE).
DROP TABLE IF EXISTS g1039_i18n;
CREATE TABLE g1039_i18n (name STRING)
ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t' STORED AS TEXTFILE;
INSERT INTO g1039_i18n VALUES ('邵铮'), ('ascii_row');
SELECT 'all' AS tag, count(1) AS n FROM g1039_i18n
UNION ALL
SELECT name, count(1) FROM g1039_i18n WHERE g1039_i18n.name = '邵铮' GROUP BY name;
