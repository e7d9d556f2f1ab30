-- quotedid_basic.q: backquoted identifiers — reserved words, embedded
-- spaces and dots — must round-trip through DDL and query text.
DROP VIEW IF EXISTS g290_t;
CREATE TEMPORARY VIEW g290_t AS SELECT * FROM VALUES
  (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)
  AS t(`order`, `col name`, `x.y`);
SELECT `order`, `col name`, `x.y` * 2 AS doubled
FROM g290_t
WHERE `order` > 1 AND `x.y` <= 30
ORDER BY `order`;
