-- escape1.q family: backslash escape sequences in string literals — tab,
-- newline, backslash, single quote, unicode — plus their length and
-- round-trip through concat/replace. Output encodes whitespace via
-- hex(encode(...)) so the golden file stays printable.
SELECT
  hex(encode('a\tb', 'UTF-8'))  AS tab_hex,
  hex(encode('a\nb', 'UTF-8'))  AS nl_hex,
  hex(encode('a\\b', 'UTF-8'))  AS backslash_hex,
  hex(encode('it\'s', 'UTF-8')) AS quote_hex,
  length('a\tb') AS tab_len,
  length('é') AS unicode_len,
  replace('a\tb', '\t', '|') AS detabbed;
