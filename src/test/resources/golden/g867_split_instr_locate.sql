-- udf_split.q / udf_instr.q / udf_locate.q: split with regex classes
-- and numeric coercion, instr/locate over numeric and fractional
-- arguments with start offsets and NULL propagation.
SELECT
  split('a b c', ' ') AS sp1,
  split('oneAtwoBthreeC', '[ABC]') AS sp2,
  split('', '\\.') AS sp3,
  instr('abcd', 'abc') AS i1,
  instr('abcabc', 'ccc') AS i2,
  instr(123, '23') AS i3,
  instr(CAST(1.25 AS FLOAT), '.25') AS i4,
  instr(null, 'abc') AS i5,
  locate('abc', 'abcd') AS l1,
  locate('abc', 'abcabc', 2) AS l2,
  locate('abc', 'abcabc', '2') AS l3,
  locate('23', 123) AS l4,
  locate(null, 'abc') AS l5,
  locate('abc', null) AS l6
