-- macro_1.q tail: DROP TEMPORARY MACRO, then re-create under the same
-- name with a different body — the second definition must win.
CREATE TEMPORARY MACRO g297_m(x INT) x * 2;
DROP TEMPORARY MACRO g297_m;
CREATE TEMPORARY MACRO g297_m(x INT) x * 3;
DROP TEMPORARY MACRO IF EXISTS g297_never_existed;
SELECT g297_m(7) AS v;
