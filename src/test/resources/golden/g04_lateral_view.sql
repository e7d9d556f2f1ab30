SELECT doc_id, w FROM documents
LATERAL VIEW explode(split(text, ' ')) t AS w
WHERE doc_id < 5
