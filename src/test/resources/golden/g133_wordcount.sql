SELECT w, count(*) AS n
FROM (SELECT explode(split(lower(text), ' ')) AS w FROM documents WHERE doc_id < 20) t
WHERE length(w) > 3
GROUP BY w
HAVING count(*) >= 5
