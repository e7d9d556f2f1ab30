-- timestamp vs string/date comparison and arithmetic
SELECT count(*) AS n_str FROM lineitem WHERE l_shipdate > '1995-06-15';
SELECT count(*) AS n_ts FROM lineitem WHERE l_shipdate > CAST('1995-06-15' AS TIMESTAMP);
SELECT (SELECT count(*) FROM lineitem WHERE l_shipdate > '1995-06-15') AS a,
       (SELECT count(*) FROM lineitem WHERE l_shipdate > CAST('1995-06-15 00:00:00' AS TIMESTAMP)) AS b,
       (SELECT count(*) FROM lineitem WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31') AS c
