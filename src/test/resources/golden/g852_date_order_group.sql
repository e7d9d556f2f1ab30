-- date_2.q: ORDER BY over a DATE column both directions with a
-- secondary numeric key, and GROUP BY on the date.
DROP TABLE IF EXISTS g852_d2;
CREATE TABLE g852_d2 (fl_date DATE, fl_num INT) USING parquet;
INSERT INTO g852_d2 VALUES
  (date'2000-11-20', 7), (date'2000-11-20', 3),
  (date'2000-11-21', 5), (date'2000-12-02', 1), (date'2000-12-02', 9);
SELECT 'asc' AS tag, CAST(fl_date AS STRING) AS d, CAST(fl_num AS STRING) AS n
FROM (SELECT fl_date, fl_num FROM g852_d2 ORDER BY fl_date ASC, fl_num DESC) t
UNION ALL
SELECT 'grp', CAST(fl_date AS STRING), CAST(count(*) AS STRING)
FROM g852_d2 GROUP BY fl_date
