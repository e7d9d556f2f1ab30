-- reference: ql/src/test/queries/clientpositive/udf9.q — DATEDIFF /
-- DATE_ADD / DATE_SUB across year ends, leap years, and timestamp
-- string operands.
SELECT DATEDIFF('2008-12-31', '2009-01-01') AS dd1,
       DATEDIFF('2008-03-01', '2008-02-28') AS dd2,
       DATEDIFF('2007-03-01', '2007-01-28') AS dd3,
       DATEDIFF('2008-03-01 23:59:59', '2008-03-02 00:00:00') AS dd4,
       DATE_ADD('2008-12-31', 1) AS da1, DATE_ADD('2008-12-31', 365) AS da2,
       DATE_ADD('2008-02-28', 2) AS da3, DATE_ADD('2009-02-28', 2) AS da4,
       DATE_ADD('2007-02-28', 365) AS da5,
       DATE_ADD('2007-02-28 23:59:59', 730) AS da6,
       DATE_SUB('2009-01-01', 1) AS ds1, DATE_SUB('2009-01-01', 365) AS ds2,
       DATE_SUB('2008-02-28', 2) AS ds3, DATE_SUB('2009-02-28', 2) AS ds4,
       DATE_SUB('2007-02-28', 365) AS ds5,
       DATE_SUB('2007-02-28 01:12:34', 730) AS ds6
FROM nation TABLESAMPLE (1 ROWS)
