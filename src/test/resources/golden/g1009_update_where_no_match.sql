-- update_where_no_match.q: an UPDATE whose WHERE matches NOTHING — the
-- table reads back bit-identical (no rewrite side effects).
DROP TABLE IF EXISTS g1009_wnm;
CREATE TABLE g1009_wnm (a INT, b VARCHAR(128))
  CLUSTERED BY (a) INTO 2 BUCKETS STORED AS ORC
  TBLPROPERTIES ('transactional'='true');
INSERT INTO g1009_wnm
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey < 6;
UPDATE g1009_wnm SET b = 'fred' WHERE b = 'nosuchvalue';
SELECT a, b FROM g1009_wnm ORDER BY a
