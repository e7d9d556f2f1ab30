SELECT s_suppkey, instr(s_name, '#') AS i1, locate('1', s_name) AS i2,
  lpad(s_name, 14, '*') AS p1, rpad(cast(s_suppkey AS string), 5, '0') AS p2,
  translate(s_name, '#', '-') AS tr, initcap(lower(s_name)) AS ic,
  levenshtein(s_name, 'Supplier') AS lv, reverse(s_name) AS rv, ascii(s_name) AS ac
FROM supplier WHERE s_suppkey <= 20
