-- union_date.q: UNION ALL over tables with a DATE column — the date
-- type must survive the union and the join back onto it.
DROP TABLE IF EXISTS g835_u1;
DROP TABLE IF EXISTS g835_u2;
CREATE TABLE g835_u1 (fl_date DATE, fl_num INT) USING parquet;
CREATE TABLE g835_u2 (fl_date DATE, fl_num INT) USING parquet;
INSERT INTO g835_u1 VALUES (date'2000-11-20', 1), (date'2000-11-21', 2);
INSERT INTO g835_u2 VALUES (date'2000-11-20', 3), (date'2000-12-02', 4);
SELECT u.fl_date, u.fl_num FROM (
  SELECT fl_date, fl_num FROM g835_u1
  UNION ALL
  SELECT fl_date, fl_num FROM g835_u2
) u
WHERE u.fl_date >= date'2000-11-21' OR u.fl_num = 1
