-- groupby positional alias + HAVING on the aggregate
SELECT o_orderstatus AS st, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 10
