-- reference: ql/src/test/queries/clientpositive/input16.q + input16_cc.q
-- — a text serde with a NON-default field delimiter (ctrl-C \003 in the
-- reference's TestSerDe override); values containing the default \001
-- and tab delimiters must survive because only \003 separates fields.
DROP TABLE IF EXISTS g1024_cc;
CREATE TABLE g1024_cc (key STRING, value STRING)
ROW FORMAT DELIMITED FIELDS TERMINATED BY '\003' STORED AS TEXTFILE;
INSERT INTO g1024_cc SELECT concat('k', n_nationkey), concat(n_name, '\t', 'tabbed') FROM nation WHERE n_nationkey < 5;
SELECT g1024_cc.value, g1024_cc.key FROM g1024_cc;
