-- count(*) vs count(1) vs count(NULL) vs count(col) vs sum/avg of NULL
SELECT count(*) AS c_star, count(1) AS c_one, count(NULL) AS c_null,
       count(o_orderstatus) AS c_col, sum(CAST(NULL AS INT)) AS s_null,
       avg(CAST(NULL AS DOUBLE)) AS a_null, max(CAST(NULL AS STRING)) AS m_null
FROM orders
