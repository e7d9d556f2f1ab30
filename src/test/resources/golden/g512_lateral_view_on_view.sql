-- lateral_view_onview.q: LATERAL VIEW over a named VIEW whose definition
-- itself builds the array.
DROP VIEW IF EXISTS g512_v;
DROP TABLE IF EXISTS g512_base;
CREATE TABLE g512_base (k INT, words STRING);
INSERT INTO g512_base VALUES (1, 'a b c'), (2, 'x y'), (3, '');
CREATE VIEW g512_v AS SELECT k, split(words, ' ') AS arr FROM g512_base;
SELECT k, w
FROM g512_v LATERAL VIEW OUTER explode(arr) t AS w
WHERE w <> '' OR w IS NULL
