-- vector_coalesce.q + vector_coalesce_2.q: COALESCE across NULL string/
-- numeric mixes — the reference's ROUND(sum(cast(COALESCE(str1, 0) as
-- int))/60, 2) shape, where a NULL string column falls back to the
-- numeric default and non-numeric strings cast to NULL→0 sum cleanly.
DROP TABLE IF EXISTS g881_ss;
CREATE TABLE g881_ss (str1 STRING, str2 STRING) USING parquet;
INSERT INTO g881_ss VALUES (NULL, 'X'), ('0', 'X'), ('1', 'X'), (NULL, 'y');
SELECT str2,
       round(sum(CAST(COALESCE(str1, 0) AS INT)) / 60, 2) AS result,
       COALESCE(max(str1), 'none') AS mx
FROM g881_ss GROUP BY str2 ORDER BY str2
