WITH t AS (SELECT doc_id, concat('{"id":', cast(doc_id AS string), ',"lang":"', lang, '"}') AS js
           FROM documents WHERE doc_id < 8)
SELECT doc_id, parsed.id AS jid, parsed.lang AS jlang,
  schema_of_json('{"id":1,"lang":"en"}') AS sch
FROM (SELECT doc_id, from_json(js, 'id BIGINT, lang STRING') AS parsed FROM t) x
