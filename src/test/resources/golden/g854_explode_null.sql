-- explode_null.q: explode over a UNION where one branch yields a NULL
-- array/map — the NULL row generates nothing, array and map flavors.
SELECT 'arr' AS tag, CAST(myCol AS STRING) AS c1, '' AS c2
FROM (SELECT explode(col) AS myCol FROM
  (SELECT array(1,2,3) AS col
   UNION ALL
   SELECT IF(false, array(1,2,3), NULL) AS col) a) e
UNION ALL
SELECT 'map', CAST(k AS STRING), v
FROM (SELECT explode(col) AS (k, v) FROM
  (SELECT map(1,'one',2,'two') AS col
   UNION ALL
   SELECT IF(false, map(1,'one'), NULL) AS col) a) e2
