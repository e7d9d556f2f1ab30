SELECT doc_id, regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS w2,
  regexp_count(substr(text, 1, 50), 'a') AS na,
  regexp_instr(text, 'data') AS pi,
  substr(text, 1, 20) rlike '[0-9]' AS has_digit
FROM documents WHERE doc_id < 15
