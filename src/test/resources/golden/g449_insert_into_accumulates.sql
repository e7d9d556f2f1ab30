-- insert_into1.q/2.q: INSERT INTO appends (never overwrites); a following
-- INSERT OVERWRITE resets; counts checked via a tagged union.
DROP TABLE IF EXISTS g449_t;
CREATE TABLE g449_t (key INT, value STRING);
INSERT INTO TABLE g449_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
INSERT INTO TABLE g449_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
INSERT INTO TABLE g449_t SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3;
SELECT cast(count(*) AS STRING) AS v, 'after_3_appends' AS tag FROM g449_t
UNION ALL
SELECT cast(sum(key) AS STRING), 'sum_after_appends' FROM g449_t
