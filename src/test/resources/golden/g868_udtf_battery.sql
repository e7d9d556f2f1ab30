-- udtf_explode.q / udtf_stack.q: explode over array and map in SELECT
-- position, grouped over the exploded output, and STACK with uneven
-- rows (missing cells NULL-padded) plus a bare one-row stack.
SELECT 'arr' AS tag, CAST(c1 AS STRING) AS c1, c2 FROM
  (SELECT a.myCol AS c1, CAST(count(1) AS STRING) AS c2 FROM
    (SELECT explode(array(1,2,3)) AS myCol FROM nation LIMIT 3) a
   GROUP BY a.myCol) t
UNION ALL
SELECT 'map', CAST(myKey AS STRING), myVal FROM
  (SELECT explode(map(1,'one',2,'two',3,'three')) AS (myKey, myVal)
   FROM nation LIMIT 3) m
UNION ALL
SELECT 'stack', CAST(x AS STRING), CAST(y AS STRING) FROM
  (SELECT stack(2, 'x', array(1), 'z') AS (x, y)) s
UNION ALL
SELECT 'stack1', s1, s2 FROM
  (SELECT stack(1, 'en', 'dbpedia') AS (s1, s2)) s
