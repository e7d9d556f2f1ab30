-- quote2.q: string literal escaping — backslash-quote, doubled
-- backslashes, embedded other-quote runs, and \t — in both quote
-- styles.
SELECT
    'abc' AS a1,        "abc" AS a2,
    'abc\'' AS b1,      "abc\"" AS b2,
    'abc\\' AS c1,      "abc\\" AS c2,
    'abc\\\'' AS d1,    "abc\\\"" AS d2,
    'abc\\\\' AS e1,    "abc\\\\" AS e2,
    'abc""""\\' AS f1,  "abc''''\\" AS f2,
    "awk '{print NR\"\\t\"$0}'" AS g1,
    'tab\ttab' AS h1,   "tab\ttab" AS h2
FROM nation
LIMIT 1
