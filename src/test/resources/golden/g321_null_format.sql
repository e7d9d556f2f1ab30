-- nullformat.q: CREATE TABLE ... NULL DEFINED AS a custom marker — the
-- legacy-DDL rewrite must carry the marker into the csv options so NULLs
-- round-trip through the custom spelling (serde2/lazy/
-- LazySerDeParameters serialization.null.format).
DROP TABLE IF EXISTS g321_t;
CREATE TABLE g321_t (k INT, v STRING)
ROW FORMAT DELIMITED FIELDS TERMINATED BY ',' NULL DEFINED AS 'fooNull'
STORED AS TEXTFILE;
INSERT INTO g321_t VALUES (1, 'a'), (2, NULL), (3, 'fooNull');
SELECT k, v, v IS NULL AS is_null FROM g321_t ORDER BY k;
