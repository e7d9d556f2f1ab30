-- udf_greatest.q: GREATEST/LEAST over string triples — case-sensitive
-- ordering, numeric STRINGS compare lexically ('2' > '13'), and any
-- NULL argument nulls the result (Hive 1.2 semantics the engine pins).
SELECT
  greatest('a', 'b', 'c') AS g1,
  greatest('C', 'a', 'B') AS g2,
  greatest('AAA', 'AaA', 'AAa') AS g3,
  greatest('A', 'AA', 'AAA') AS g4,
  greatest('11', '2', '12') AS g5,
  greatest(NULL, 'b', 'c') AS g6,
  least('a', 'b', 'c') AS l1,
  least('C', 'a', 'B') AS l2,
  least('11', '2', '12') AS l3,
  least('a', NULL, 'c') AS l4
