-- str_to_map with custom pair/kv delimiters
SELECT r_regionkey, m['x'] AS x, m['y'] AS y, size(m) AS sz
FROM (SELECT r_regionkey,
        str_to_map(concat('x:', r_regionkey, ';y:', r_name), ';', ':') AS m
      FROM region) t
