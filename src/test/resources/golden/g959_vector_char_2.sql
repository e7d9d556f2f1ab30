-- vector_char_2.q: char(10)/char(20) columns written from plain strings
-- group, sum and order exactly like the string source ("should match
-- the query from src") — both ascending and descending limits union'd
-- into one pinned result.
DROP TABLE IF EXISTS g959_src;
CREATE TABLE g959_src USING parquet AS
  SELECT CAST(n_nationkey AS STRING) AS key,
         concat('val_', n_regionkey) AS value FROM nation;
DROP TABLE IF EXISTS g959_char2;
CREATE TABLE g959_char2 (key CHAR(10), value CHAR(20)) USING parquet;
INSERT OVERWRITE TABLE g959_char2 SELECT * FROM g959_src;
SELECT * FROM
  (SELECT 'char_asc' AS probe, value, sum(cast(key AS int)) AS s,
          count(*) AS numrows
   FROM g959_char2 GROUP BY value ORDER BY value ASC LIMIT 3) a
UNION ALL
SELECT * FROM
  (SELECT 'str_asc' AS probe, value, sum(cast(key AS int)) AS s,
          count(*) AS numrows
   FROM g959_src GROUP BY value ORDER BY value ASC LIMIT 3) b
UNION ALL
SELECT * FROM
  (SELECT 'char_desc' AS probe, value, sum(cast(key AS int)) AS s,
          count(*) AS numrows
   FROM g959_char2 GROUP BY value ORDER BY value DESC LIMIT 3) c
