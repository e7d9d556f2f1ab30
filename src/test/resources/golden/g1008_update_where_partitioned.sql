-- update_where_partitioned.q: UPDATE with a WHERE hitting rows in ONE
-- partition of a transactional bucketed table — other partitions'
-- rows (and non-matching rows in the same partition) are untouched.
DROP TABLE IF EXISTS g1008_uwp;
CREATE TABLE g1008_uwp (a INT, b VARCHAR(128))
  PARTITIONED BY (ds STRING) CLUSTERED BY (a) INTO 2 BUCKETS
  STORED AS ORC TBLPROPERTIES ('transactional'='true');
INSERT INTO g1008_uwp PARTITION (ds='today')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey < 5;
INSERT INTO g1008_uwp PARTITION (ds='tomorrow')
  SELECT CAST(n_nationkey AS INT), n_name FROM nation
  WHERE n_nationkey BETWEEN 5 AND 9;
UPDATE g1008_uwp SET b = 'fred' WHERE b = 'NATION_7';
SELECT a, b, ds FROM g1008_uwp ORDER BY a, ds, b
