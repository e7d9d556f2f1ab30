-- union_remove_6.q / union_remove_19.q shapes: union branches that are NOT
-- symmetric — one aggregated, one filtered-raw — plus a double-insert of
-- the same union into two tables (multi-insert over a union).
DROP TABLE IF EXISTS g433_in;
DROP TABLE IF EXISTS g433_o1;
DROP TABLE IF EXISTS g433_o2;
CREATE TABLE g433_in (key STRING, val STRING) STORED AS TEXTFILE;
CREATE TABLE g433_o1 (key STRING, cnt BIGINT) STORED AS TEXTFILE;
CREATE TABLE g433_o2 (key STRING, cnt BIGINT) STORED AS TEXTFILE;
INSERT INTO g433_in VALUES ('1','11'), ('2','12'), ('2','22'), ('3','13'), ('8','18'), ('8','28');
FROM (
  SELECT key, count(1) AS cnt FROM g433_in GROUP BY key
  UNION ALL
  SELECT key, cast(val AS BIGINT) AS cnt FROM g433_in WHERE key > '2'
) u
INSERT OVERWRITE TABLE g433_o1 SELECT u.key, u.cnt
INSERT OVERWRITE TABLE g433_o2 SELECT u.key, u.cnt WHERE u.cnt > 12;
SELECT 'o1' AS src, key, cnt FROM g433_o1
UNION ALL
SELECT 'o2', key, cnt FROM g433_o2
