-- reference: ql/src/test/queries/clientpositive/escape3.q — ESCAPED BY
-- '\134' (octal backslash) on a pipe-delimited text table, STRING and
-- VARCHAR variants; a value containing pipe and backslash round-trips.
DROP TABLE IF EXISTS g1138_s;
DROP TABLE IF EXISTS g1138_v;
CREATE TABLE g1138_s (gerund STRING, abbrev STRING, code SMALLINT)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' ESCAPED BY '\134'
  STORED AS TEXTFILE;
INSERT INTO g1138_s
  SELECT concat('run|ning', '\\'), concat(substr(n_name, 1, 2), '|x'),
         CAST(n_nationkey AS SMALLINT)
  FROM nation WHERE n_nationkey < 3;
CREATE TABLE g1138_v (gerund VARCHAR(12), abbrev VARCHAR(5), code SMALLINT)
  ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' ESCAPED BY '\134'
  STORED AS TEXTFILE;
INSERT INTO g1138_v SELECT * FROM g1138_s;
SELECT s.gerund, s.abbrev, s.code, v.gerund AS vg, length(s.gerund) AS glen
FROM g1138_s s JOIN g1138_v v ON s.code = v.code
