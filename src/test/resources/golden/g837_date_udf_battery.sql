-- date_udf.q: the date-function battery over a DATE column and its
-- STRING twin — year/month/day/dayofmonth/weekofyear/to_date agree
-- across both representations, plus date_add/date_sub/datediff.
DROP TABLE IF EXISTS g837_d;
DROP TABLE IF EXISTS g837_s;
CREATE TABLE g837_d (d DATE) USING parquet;
CREATE TABLE g837_s (d STRING) USING parquet;
INSERT INTO g837_d VALUES (date'2011-05-06');
INSERT INTO g837_s VALUES ('2011-05-06');
SELECT year(d) AS y, month(d) AS m, day(d) AS dd, dayofmonth(d) AS dom,
       weekofyear(d) AS woy, to_date(d) AS td,
       date_add(d, 5) AS da, date_sub(d, 10) AS ds,
       datediff(d, '2002-03-21') AS dif1, datediff('2002-03-21', d) AS dif2
FROM g837_d
UNION ALL
SELECT year(d), month(d), day(d), dayofmonth(d),
       weekofyear(d), to_date(d),
       date_add(d, 5), date_sub(d, 10),
       datediff(d, '2002-03-21'), datediff('2002-03-21', d)
FROM g837_s
