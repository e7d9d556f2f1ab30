-- LIKE/RLIKE dialect incl. literal % escape and anchored rlike
SELECT count(*) AS n_pct FROM part WHERE p_type LIKE '%BRASS%';
SELECT p_name LIKE 'a\%b' AS esc, p_name RLIKE '^[a-z]+' AS anchored,
       p_name LIKE '_____%' AS five_plus, count(*) AS n
FROM part GROUP BY 1, 2, 3
