WITH t AS (SELECT doc_id,
             str_to_map(concat('id:', cast(doc_id AS string), ',lang:', lang), ',', ':') AS m
           FROM documents WHERE doc_id < 10)
SELECT doc_id, k, v FROM t LATERAL VIEW explode(m) e AS k, v
