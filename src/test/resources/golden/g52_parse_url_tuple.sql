SELECT u.doc_id, p.host, p.qlang
FROM (SELECT doc_id,
        concat('https://', source, '.example.com/d/', doc_id, '?lang=', lang) AS url
      FROM documents WHERE doc_id < 20) u
LATERAL VIEW parse_url_tuple(u.url, 'HOST', 'QUERY:lang') p AS host, qlang
