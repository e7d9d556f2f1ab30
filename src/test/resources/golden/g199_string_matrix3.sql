-- udf string breadth: initcap/translate/pads/repeat/reverse/ascii/instr/locate/levenshtein/soundex
SELECT c_custkey,
  initcap(lower(c_name)) AS ic, translate(c_name, '#', '_') AS tr,
  lpad(c_mktsegment, 12, '*') AS lp, rpad(c_mktsegment, 12, '*') AS rp,
  repeat(substr(c_name, 1, 3), 2) AS rep, reverse(c_mktsegment) AS rev,
  ascii(c_mktsegment) AS asc_c, instr(c_name, '0') AS ins,
  locate('1', c_name, 3) AS loc, levenshtein(c_mktsegment, 'BUILDING') AS lev,
  soundex(c_mktsegment) AS sdx
FROM customer WHERE c_custkey <= 30
