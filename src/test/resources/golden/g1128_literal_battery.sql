-- reference: ql/src/test/queries/clientpositive/literal_decimal.q +
-- literal_double.q + literal_ints.q + literal_string.q — the literal
-- grammar: BD decimal suffix (incl. overflow-to-NULL 1E99BD), double
-- exponent forms, Y/S/L integer suffixes, doubled-quote escapes and
-- adjacent string literal concatenation.
SELECT -1BD AS d1, 3.14BD AS d2, 99999999999999999BD AS d3,
       3.14e8 AS e1, 3.14e-8 AS e2, -3.14E8 AS e3,
       100 AS i, 100Y AS y, 100S AS s, 100L AS l,
       'face''book' AS q1, "face""book" AS q2,
       'face' 'book' AS c1, 'face' 'bo' 'ok' AS c2,
       'face'"book" AS c3
FROM nation TABLESAMPLE (1 ROWS)
